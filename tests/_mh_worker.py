"""Multi-host worker: one process of an N-process offline EAGLE3 training run.

Launched as a subprocess by tests/test_multihost.py (the reference pattern:
env-var-driven multi-rank workers on one machine, _fixtures.py:56-80 there).
Runs the PRODUCTION composition path (build_training_run) on a global mesh
spanning all processes, then dumps the fully-gathered final params + buffers
on the primary so the parent can compare against a single-process run.

Usage: python _mh_worker.py <proc_id> <n_procs> <port> <workdir> <num_epochs> <resume>
"""

import json
import os
import sys


def main() -> int:
    proc_id, n_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    workdir, num_epochs, resume = sys.argv[4], int(sys.argv[5]), sys.argv[6] == "1"

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_procs,
        process_id=proc_id,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from specforge_tpu.application.composition import build_training_run
    from specforge_tpu.config.schema import Config

    with open(os.path.join(workdir, "run_config.json")) as f:
        payload = json.load(f)
    payload["training"]["num_epochs"] = num_epochs
    payload["training"]["resume"] = resume
    config = Config.model_validate(payload)

    rng = np.random.default_rng(7)
    v = payload["model"]["draft_config"]["vocab_size"]
    h = payload["model"]["draft_config"]["hidden_size"]
    frozen = {
        "target_head_weight": jnp.asarray(
            rng.normal(size=(v, h)).astype(np.float32)
        )
    }

    trainer = build_training_run(config, frozen_override=frozen)
    assert trainer.world_size == n_procs
    metrics = trainer.fit()

    # gather the sharded state to host on the primary for comparison
    mesh = trainer.mesh
    replicate = jax.jit(
        lambda t: t,
        out_shardings=jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), trainer.state.params
        ),
    )
    full = jax.device_get(replicate(trainer.state.params))
    if proc_id == 0:
        flat = {}
        from flax import traverse_util

        for k, leaf in traverse_util.flatten_dict(full).items():
            flat["/".join(k)] = np.asarray(leaf, dtype=np.float32)
        np.savez(os.path.join(workdir, "mh_params.npz"), **flat)
        with open(os.path.join(workdir, "mh_metrics.json"), "w") as f:
            json.dump({k: float(val) for k, val in metrics.items()}, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
