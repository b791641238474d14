#!/usr/bin/env python
"""Offline feature capture: target prefill over a conversation dataset.

The TPU-native equivalent of the reference torchrun capture script
(specforge/scripts/prepare_hidden_states.py:87-937): tokenizes conversations
with the chat template, runs the frozen target's prefill on the local TPU
chip(s), writes per-sample .sft feature files in the algorithm's layout, and
derives the shared vocab mapping.

Usage:
    python scripts/prepare_hidden_states.py \
        --target-model /path/to/qwen3-8b \
        --data conversations.jsonl \
        --output-dir features/ \
        --algorithm eagle3 --chat-template qwen --max-length 2048 \
        --draft-config configs/qwen3-8b-eagle3.json
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--target-model", required=True)
    parser.add_argument("--data", required=True, help="conversation JSONL")
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--algorithm", default="eagle3",
                        choices=["eagle3", "peagle", "dflash", "domino",
                                 "dspark"])
    parser.add_argument("--chat-template", default="qwen")
    parser.add_argument("--max-length", type=int, default=2048)
    parser.add_argument(
        "--train-only-last-turn", action="store_true",
        help="supervise only the final assistant turn "
             "(reference data.train_only_last_turn, schema.py:143)",
    )
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--draft-config", help="draft config JSON (for "
                        "capture layers + draft vocab size)")
    parser.add_argument("--capture-layers", type=int, nargs="*")
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument(
        "--shard-over-devices", action="store_true",
        help="shard target params over all local chips (fsdp mesh) — "
             "captures targets larger than one chip's HBM",
    )
    parser.add_argument(
        "--moe-impl", choices=("dense", "gathered", "ep"),
        help="MoE path for MoE targets; 'ep' keeps expert tables sharded "
             "over the mesh (requires --shard-over-devices)",
    )
    parser.add_argument(
        "--moe-capacity-factor", type=float,
        help="EP per-shard row budget as a multiple of rows/ep "
             "(default: full capacity, never drops)",
    )
    args = parser.parse_args()

    from transformers import AutoTokenizer

    from specforge_tpu.algorithms.builtin import builtin_algorithm_registry
    from specforge_tpu.data.parse import build_dataset
    from specforge_tpu.models.target.transformer import TargetConfig
    from specforge_tpu.offline_capture.capture import (
        OfflineCaptureConfig,
        OfflineCaptureRunner,
    )
    from specforge_tpu.training.vocab_mapping import (
        derive_vocab_mapping,
        save_vocab_mapping,
    )

    registry = builtin_algorithm_registry()
    registration = registry.resolve(args.algorithm)
    target_config = TargetConfig.from_file(args.target_model)

    draft_config = None
    if args.draft_config:
        _, draft_config = registration.providers.build_draft(
            json.load(open(args.draft_config))
        )
    capture_layers = registration.providers.resolve_capture_layers(
        draft_config, target_config.num_hidden_layers,
        tuple(args.capture_layers) if args.capture_layers else None,
    )
    layout = "eagle" if args.algorithm in ("eagle3", "peagle") else "dflash"
    print(f"capture layers: {capture_layers} (layout={layout})")

    tokenizer = AutoTokenizer.from_pretrained(args.target_model)
    records = []
    with open(args.data) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
            if args.limit and len(records) >= args.limit:
                break
    samples = build_dataset(
        records, tokenizer, args.chat_template, args.max_length,
        train_only_last_turn=args.train_only_last_turn,
    )
    print(f"tokenized {len(samples)} supervised conversations")

    mesh = None
    if args.shard_over_devices:
        import jax

        from specforge_tpu.parallel.mesh import MeshConfig, build_mesh

        mesh = build_mesh(MeshConfig(fsdp=jax.device_count()))
        print(f"sharding target over {jax.device_count()} devices")
    runner = OfflineCaptureRunner(
        OfflineCaptureConfig(
            target_model_path=args.target_model,
            output_dir=args.output_dir,
            capture_layers=tuple(capture_layers),
            max_length=args.max_length,
            batch_size=args.batch_size,
            layout=layout,
        ),
        target_config=target_config,
        mesh=mesh,
        moe_impl=args.moe_impl,
        moe_capacity_factor=args.moe_capacity_factor,
    )
    written = runner.run(
        [{"input_ids": s.input_ids, "loss_mask": s.loss_mask} for s in samples]
    )
    print(f"wrote {len(written)} feature files")

    draft_vocab = getattr(draft_config, "draft_vocab_size", None)
    if draft_vocab and draft_vocab < target_config.vocab_size:
        t2d, d2t = derive_vocab_mapping(
            (s.input_ids for s in samples),
            target_config.vocab_size,
            draft_vocab,
        )
        path = f"{args.output_dir}/vocab_mapping.npz"
        save_vocab_mapping(path, t2d, d2t)
        print(f"wrote vocab mapping to {path}")


if __name__ == "__main__":
    main()
