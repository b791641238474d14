"""Online-consumer subprocess for kill-and-restart recovery tests.

Usage: python _consumer_worker.py <config.json>
Runs run_consumer on CPU and prints the final metrics as JSON.
"""

import json
import os
import sys


def main() -> int:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    # multi-host consumer runs join the distributed runtime from
    # SPECFORGE_COORDINATOR/NUM_PROCESSES/PROCESS_ID env (run_consumer also
    # calls this; doing it here keeps the config update ordering explicit)
    from specforge_tpu.parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()

    from specforge_tpu.application.disaggregated import run_consumer
    from specforge_tpu.config.schema import Config

    with open(sys.argv[1]) as f:
        config = Config.model_validate(json.load(f))
    metrics = run_consumer(config)
    print(json.dumps({k: float(v) for k, v in metrics.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
