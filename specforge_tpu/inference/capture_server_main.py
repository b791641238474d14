"""Standalone capture-server entry point (spawned by the managed supervisor).

    python -m specforge_tpu.inference.capture_server_main \
        --target-model /path/to/target --port 38200 --config run.json
"""

from __future__ import annotations

import argparse
import json
import signal
import threading


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--target-model", required=True)
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--config", help="run config (for capture layers)")
    parser.add_argument("--capture-layers", type=int, nargs="*")
    parser.add_argument("--layout", default="eagle",
                        choices=["eagle", "dflash"])
    parser.add_argument("--max-length", type=int, default=2048)
    parser.add_argument(
        "--shard-over-devices", type=int, default=1, metavar="N",
        help="shard the target over N local devices (fsdp mesh; 0 = all "
             "local devices, 1 = single-device) — the online counterpart "
             "of the reference's per-server tp_size "
             "(ref specforge/config/schema.py:314)",
    )
    parser.add_argument(
        "--moe-impl", choices=("dense", "gathered", "ep"),
        help="MoE path for MoE targets; 'ep' keeps expert tables sharded "
             "over the mesh (requires --shard-over-devices != 1)",
    )
    parser.add_argument(
        "--moe-capacity-factor", type=float,
        help="EP per-shard row budget as a multiple of rows/ep "
             "(default: full capacity, never drops)",
    )
    args = parser.parse_args()

    capture_layers = args.capture_layers
    layout = args.layout
    max_length = args.max_length
    if args.config:
        from specforge_tpu.application.composition import resolve_run
        from specforge_tpu.config.schema import load_config
        from specforge_tpu.models.target.transformer import TargetConfig

        config = load_config(args.config)
        resolved = resolve_run(config)
        _, draft_config = resolved.registration.providers.build_draft(
            resolved.draft_config_dict
        )
        target_config = TargetConfig.from_file(args.target_model)
        capture_layers = capture_layers or list(
            resolved.registration.providers.resolve_capture_layers(
                draft_config, target_config.num_hidden_layers,
                tuple(config.model.aux_hidden_state_layer_ids)
                if config.model.aux_hidden_state_layer_ids else None,
            )
        )
        layout = (
            "eagle"
            if config.training.strategy in ("eagle3", "peagle")
            else "dflash"
        )
        max_length = config.data.max_length
    if not capture_layers:
        raise SystemExit("--capture-layers or --config is required")

    from specforge_tpu.inference.capture_server import (
        CaptureEngine,
        CaptureServer,
    )

    mesh = None
    if args.shard_over_devices != 1:
        from specforge_tpu.offline_capture.capture import build_capture_mesh

        mesh = build_capture_mesh(args.shard_over_devices)
        print(
            f"sharding target over {mesh.devices.size} devices", flush=True
        )

    engine = CaptureEngine(
        args.target_model, capture_layers=tuple(capture_layers),
        layout=layout, max_length=max_length, mesh=mesh,
        moe_impl=args.moe_impl,
        moe_capacity_factor=args.moe_capacity_factor,
    )
    server = CaptureServer(engine, host=args.host, port=args.port)
    stop = threading.Event()
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    signal.signal(signal.SIGINT, lambda *_: stop.set())
    server.start()
    print(f"capture server ready on {args.host}:{server.port}", flush=True)
    stop.wait()
    server.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
