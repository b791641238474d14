"""CLI entrypoint: serve an exported draft natively on TPU.

    python -m specforge_tpu.inference.serving_server_main \
        --target <hf_target_dir> --export <export_dir> \
        [--family eagle3|dflash] [--draft-tokens 4] [--max-len 2048] \
        [--port 8400] [--shard-over-devices N]

Loads the target + exported draft through the serving loaders
(inference/serving_loaders.py), builds the fused decoder (optionally
mesh-sharded over N devices for bigger-than-HBM targets), and serves
/generate, /generate_batch, /health (see serving_server.py).
"""

from __future__ import annotations

import argparse
import logging
import signal
import sys


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--target", required=True)
    parser.add_argument("--export", required=True)
    parser.add_argument("--family", default="eagle3",
                        choices=["eagle3", "dflash"],
                        help="dflash covers domino/dspark exports too "
                             "(block speculation)")
    parser.add_argument("--draft-tokens", type=int, default=4)
    parser.add_argument("--max-len", type=int, default=2048)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8400)
    parser.add_argument("--default-max-new-tokens", type=int, default=128)
    parser.add_argument("--shard-over-devices", type=int, default=0,
                        help="shard the target over an fsdp mesh of N "
                             "devices (0 = unsharded)")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    mesh = None
    if args.shard_over_devices > 1:
        import jax

        from specforge_tpu.parallel.mesh import MeshConfig, build_mesh

        mesh = build_mesh(
            MeshConfig(fsdp=args.shard_over_devices),
            devices=jax.devices()[: args.shard_over_devices],
        )

    if args.family == "eagle3":
        from specforge_tpu.inference.serving_loaders import (
            build_decoder,
            load_spec_models,
        )

        models = load_spec_models(args.target, args.export)
        decoder = build_decoder(
            models, num_draft_tokens=args.draft_tokens,
            max_len=args.max_len, mesh=mesh,
        )
    else:
        from specforge_tpu.inference.serving_loaders import (
            load_exported_dflash_draft,
        )
        from specforge_tpu.inference.spec_decode import DFlashSpecDecoder
        from specforge_tpu.models.target.transformer import (
            TargetConfig,
            load_target_params,
        )

        target_config = TargetConfig.from_file(args.target)
        target_params = load_target_params(args.target, target_config)
        module, variables = load_exported_dflash_draft(args.export)
        decoder = DFlashSpecDecoder(
            target_params, target_config, module, variables,
            max_len=args.max_len, mesh=mesh,
        )

    from specforge_tpu.inference.serving_server import SpecServingServer

    server = SpecServingServer(
        decoder, host=args.host, port=args.port,
        default_max_new_tokens=args.default_max_new_tokens,
    )
    server.start()
    print(f"READY port={server.port}", flush=True)

    stop = {"flag": False}

    def _sigterm(_sig, _frm):
        stop["flag"] = True

    signal.signal(signal.SIGTERM, _sigterm)
    signal.signal(signal.SIGINT, _sigterm)
    try:
        while not stop["flag"]:
            signal.pause()
    except KeyboardInterrupt:
        pass
    server.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
