"""Scaling-efficiency harness: per-device training throughput at 1 device
vs the full device set (and, under ``jax.distributed``, the full multi-host
world) — the BASELINE.md scaling target (>=85% efficiency 1 host -> 2 hosts)
measured the way the reference measures it (samples/s per device at fixed
per-device batch).

Run:
    python -m specforge_tpu.benchmarks.scaling                 # single host
    SPECFORGE_COORDINATOR=... python -m ...benchmarks.scaling  # per host

Weak scaling: the global batch grows with the device count, so perfect
scaling keeps per-device step time flat. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _throughput(devices, batch_per_device, seq, hidden, vocab, steps):
    import jax
    import jax.numpy as jnp

    from specforge_tpu.algorithms.eagle3.model import OnlineEagle3Model
    from specforge_tpu.models.draft.llama_eagle3 import (
        Eagle3Config,
        LlamaEagle3Draft,
    )
    from specforge_tpu.parallel.mesh import (
        MeshConfig,
        batch_sharding,
        build_mesh,
        shard_pytree_like_params,
    )
    from specforge_tpu.training.optimizer import (
        OptimizerConfig,
        build_optimizer,
        embedding_freeze_mask,
    )
    from specforge_tpu.training.strategies import Eagle3TrainStrategy
    from specforge_tpu.training.train_step import TrainState, make_train_step

    n = len(devices)
    mesh = build_mesh(MeshConfig(fsdp=n), devices=devices)
    batch = batch_per_device * n
    cfg = Eagle3Config(
        vocab_size=vocab, draft_vocab_size=vocab // 4, hidden_size=hidden,
        intermediate_size=hidden * 3, num_attention_heads=max(hidden // 128, 4),
        num_key_value_heads=max(hidden // 512, 2),
        max_position_embeddings=max(seq * 2, 4096),
    )
    draft = LlamaEagle3Draft(cfg, dtype=jnp.bfloat16)
    model = OnlineEagle3Model(
        draft_model=draft, length=4, teacher_dtype=jnp.bfloat16
    )
    strategy = Eagle3TrainStrategy(model, compact_teacher=True)
    rng = np.random.default_rng(0)
    variables = model.init(
        __import__("jax").random.PRNGKey(0),
        jnp.zeros((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
        jnp.ones((1, 8, 1), jnp.int32),
        jnp.zeros((1, 8, 3 * hidden), jnp.bfloat16),
        jnp.zeros((1, 8, vocab), jnp.bfloat16),
    )
    mask = embedding_freeze_mask(variables["params"])
    tx = build_optimizer(OptimizerConfig(lr=1e-4), 100)
    with mesh:
        params = shard_pytree_like_params(variables["params"], mesh)
        state = TrainState.create(
            params, variables["buffers"], tx, trainable_mask=mask
        )
        step_fn = make_train_step(
            strategy, tx, accum_steps=1, total_steps=100,
            metadata={"target_repr": "hidden_state"}, trainable_mask=mask,
        )
        bspec = batch_sharding(mesh)
        tensors = {
            "input_ids": rng.integers(0, vocab, size=(1, batch, seq)),
            "attention_mask": np.ones((1, batch, seq), np.int32),
            "loss_mask": (rng.random((1, batch, seq, 1)) > 0.2).astype(
                np.int32
            ),
            "hidden_state": rng.normal(
                size=(1, batch, seq, 3 * hidden)
            ).astype(np.float32),
            "target": rng.normal(size=(1, batch, seq, hidden)).astype(
                np.float32
            ),
        }
        batch_dev = {
            k: jax.device_put(np.asarray(v), bspec)
            for k, v in tensors.items()
        }
        frozen = {
            "target_head_weight": jnp.asarray(
                (rng.normal(size=(vocab, hidden)) * 0.02).astype(np.float32)
            ).astype(jnp.bfloat16)
        }
        state, metrics = step_fn(state, batch_dev, frozen)
        _ = float(metrics["train/loss"])  # compile + sync
        t0 = time.monotonic()
        for _i in range(steps):
            state, metrics = step_fn(state, batch_dev, frozen)
        _ = float(metrics["train/loss"])
        dt = (time.monotonic() - t0) / steps
    return batch / dt, dt


def main():
    import jax

    from specforge_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
    batch_per_device = int(os.environ.get("SCALE_BATCH_PER_DEVICE", "1"))
    seq = int(os.environ.get("SCALE_SEQ", "512"))
    hidden = int(os.environ.get("SCALE_HIDDEN", "1024"))
    vocab = int(os.environ.get("SCALE_VOCAB", "32000"))
    steps = int(os.environ.get("SCALE_STEPS", "5"))

    all_devices = jax.devices()
    n = len(all_devices)
    # baseline on each host's OWN first device: every process measures a
    # local 1-device mesh simultaneously (no cross-host collectives, no
    # non-addressable shards), then all join the full-world measurement
    print("measuring 1-device baseline...", file=sys.stderr)
    sps_1, dt_1 = _throughput(
        jax.local_devices()[:1], batch_per_device, seq, hidden, vocab, steps
    )
    if n > 1:
        print(f"measuring {n}-device throughput...", file=sys.stderr)
        sps_n, dt_n = _throughput(
            all_devices, batch_per_device, seq, hidden, vocab, steps
        )
    else:
        sps_n, dt_n = sps_1, dt_1
    efficiency = (sps_n / n) / sps_1 if n > 1 else 1.0
    print(json.dumps({
        "metric": "weak_scaling_efficiency",
        "value": round(efficiency, 4),
        "unit": "fraction",
        "devices": n,
        "hosts": jax.process_count(),
        "samples_per_s_1dev": round(sps_1, 3),
        "samples_per_s_full": round(sps_n, 3),
        "step_ms_1dev": round(dt_1 * 1e3, 1),
        "step_ms_full": round(dt_n * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
