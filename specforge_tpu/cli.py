"""Command-line interface: ``specforge-tpu train|export|benchmark``.

Mirrors the reference CLI surface (specforge/cli.py:169-294): ``train`` with a
config file + dotted overrides and ``--plan`` dry-run rendering; ``export`` to
HF- or SGLang-layout safetensors; ``benchmark`` for the single-chip MFU bench.
"""

from __future__ import annotations

import argparse
import json
import logging
import signal
import sys
from typing import List, Optional


class _SignalUnwind(SystemExit):
    pass


def _install_signal_unwind():
    """SIGTERM → exception so cleanup (checkpoint flush, tracker close) runs."""
    def handler(signum, _frame):
        raise _SignalUnwind(128 + signum)

    signal.signal(signal.SIGTERM, handler)


def _train(args) -> int:
    from specforge_tpu.config.schema import load_config

    config = load_config(args.config, args.set or [])
    if args.plan:
        print(json.dumps(config.model_dump(), indent=2, default=str))
        return 0

    _install_signal_unwind()
    role = config.training.role
    online = config.deployment.mode == "disaggregated"

    if role != "producer":
        # trainer-side roles may span hosts: join the JAX distributed
        # runtime before any backend use (no-op single-host). The producer
        # is a CPU-only process and must NOT join the trainer's world.
        from specforge_tpu.parallel.multihost import (
            maybe_initialize_distributed,
        )

        maybe_initialize_distributed()

    if online and role == "auto":
        from specforge_tpu.launch_plan import build_launch_plan, run_commands

        plan = build_launch_plan(
            config, args.config, managed_local=args.managed_local
        )
        print(plan.render())
        stack = config.deployment.managed_local
        grace = (
            stack.shutdown_grace_s
            if (args.managed_local and stack is not None)
            else config.deployment.shutdown_grace_s
        )
        return run_commands(plan, grace_s=grace)
    if online and role == "producer":
        from specforge_tpu.application.disaggregated import run_producer

        produced = run_producer(config)
        print(json.dumps({"samples_produced": produced}))
        return 0
    if online and role == "consumer":
        from specforge_tpu.application.disaggregated import run_consumer

        metrics = run_consumer(config)
        print(json.dumps({k: float(v) for k, v in metrics.items()}, indent=2))
        return 0

    from specforge_tpu.application.composition import build_training_run

    trainer = build_training_run(config)
    metrics = trainer.fit()
    if metrics:
        print(json.dumps({k: float(v) for k, v in metrics.items()}, indent=2))
    return 0


def _export(args) -> int:
    from specforge_tpu.export.exporter import export_checkpoint

    export_checkpoint(
        checkpoint=args.checkpoint,
        output_dir=args.output,
        fmt=args.to,
        draft_config_path=args.draft_config,
        vocab_mapping_path=args.vocab_mapping,
    )
    return 0


def _benchmark(args) -> int:
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path(args.script, run_name="__main__")
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    parser = argparse.ArgumentParser(prog="specforge-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="run a training job")
    p_train.add_argument("-c", "--config", required=True)
    p_train.add_argument(
        "--set", action="append", metavar="KEY=VALUE",
        help="dotted config override (repeatable)",
    )
    p_train.add_argument(
        "--plan", action="store_true",
        help="render the resolved config and exit",
    )
    p_train.add_argument(
        "--managed-local", action="store_true",
        help="supervise the full local stack (feature store + capture "
             "servers + producer + consumer)",
    )
    p_train.set_defaults(func=_train)

    p_export = sub.add_parser("export", help="export a trained draft")
    p_export.add_argument("checkpoint", help="checkpoint dir or run root")
    p_export.add_argument("-o", "--output", required=True)
    p_export.add_argument("--to", choices=["hf", "sglang"], default="sglang")
    p_export.add_argument("--draft-config")
    p_export.add_argument("--vocab-mapping")
    p_export.set_defaults(func=_export)

    p_bench = sub.add_parser("benchmark", help="run the MFU benchmark")
    p_bench.add_argument("--script", default="bench.py")
    p_bench.set_defaults(func=_benchmark)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
