#!/usr/bin/env python
"""Serving gate: train → export(sglang) → reload exported artifact →
speculative-decode chat smoke with the greedy-equivalence invariant.

The reference's scripts/gates/ run an exported draft inside a live SGLang
server and chat against it; the TPU-native equivalent drives the in-repo
speculative-decoding harness (inference/spec_decode.py) from the EXPORTED
checkpoint — any export-layout drift (missing serving keys, bad t2d/d2t,
wrong norm placement) breaks either the load or the exact-greedy-equivalence
check.

Usage:
    python scripts/gates/serving_gate.py --workdir /tmp/gate  # self-contained
    python scripts/gates/serving_gate.py --target <hf_dir> --export <dir> \
        --prompts prompts.jsonl
Exit 0 = gate passed; prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402


def _build_tiny_stack(workdir: str):
    """Self-contained mode: tiny target + short training run + export."""
    import jax.numpy as jnp
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from specforge_tpu.application.composition import build_training_run
    from specforge_tpu.config.schema import Config
    from specforge_tpu.export.exporter import export_checkpoint

    v, h = 128, 32
    target_dir = os.path.join(workdir, "target")
    torch.manual_seed(0)
    LlamaForCausalLM(LlamaConfig(
        vocab_size=v, hidden_size=h, intermediate_size=64,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256,
    )).save_pretrained(target_dir, safe_serialization=True)

    data_dir = os.path.join(workdir, "data")
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    from specforge_tpu.runtime.data_plane.feature_file import save_feature_file

    for i in range(8):
        seq = int(rng.integers(16, 32))
        save_feature_file(
            os.path.join(data_dir, f"s{i:03d}.sft"),
            {
                "input_ids": rng.integers(0, v, size=(seq,)).astype(np.int64),
                "loss_mask": np.ones(seq, np.int64),
                "hidden_state": rng.normal(size=(seq, 3 * h)).astype(
                    np.float32
                ),
                "target": rng.normal(size=(seq, h)).astype(np.float32),
            },
            {"target_repr": "hidden_state"},
        )

    draft_config = {
        "architectures": ["LlamaEagle3Draft"],
        "vocab_size": v, "draft_vocab_size": 48, "hidden_size": h,
        "intermediate_size": 64, "num_attention_heads": 4,
        "num_key_value_heads": 2, "max_position_embeddings": 256,
    }
    draft_config_path = os.path.join(workdir, "draft_config.json")
    with open(draft_config_path, "w") as f:
        json.dump(draft_config, f)
    config = Config.model_validate({
        "run_id": "gate0",
        "output_dir": os.path.join(workdir, "runs"),
        "model": {
            "target_model_path": target_dir,
            "draft_config": draft_config,
        },
        "data": {"train_data_path": data_dir, "max_length": 32,
                 "num_workers": 0},
        "training": {"strategy": "eagle3", "batch_size": 2, "num_epochs": 1,
                     "ttt_length": 2, "log_interval": 1},
        "tracking": {"backend": "none"},
    })
    trainer = build_training_run(config)
    trainer.fit()

    export_dir = os.path.join(workdir, "export")
    export_checkpoint(
        os.path.join(workdir, "runs"), export_dir, fmt="sglang",
        draft_config_path=draft_config_path,
    )
    return target_dir, export_dir


def run_gate(target_dir: str, export_dir: str, prompts, *,
             num_draft_tokens: int = 3, max_new_tokens: int = 16,
             topk: int = 1, capture_layers=None):
    from specforge_tpu.benchmarks.accept_length import load_exported_draft
    from specforge_tpu.inference.spec_decode import (
        Eagle3SpecDecoder,
        greedy_target_decode,
    )
    from specforge_tpu.models.target.transformer import (
        TargetConfig,
        load_target_params,
    )

    import jax.numpy as jnp

    # fp32 target: the greedy-equivalence check is EXACT (bf16 near-ties can
    # flip argmax between the k+1-token verify shape and the 1-token greedy
    # shape; the invariant is about the algorithm, not matmul rounding)
    target_config = TargetConfig.from_file(target_dir)
    target_params = load_target_params(
        target_dir, target_config, dtype=jnp.float32
    )
    n = target_config.num_hidden_layers
    if capture_layers is None:
        # must match the layers the draft's features were captured at
        capture_layers = (1, max(n // 2 - 1, 1), max(n - 4, 2))

    module, variables = load_exported_draft(
        export_dir,
        fallback_embedding=np.asarray(
            target_params["model.embed_tokens.weight"], np.float32
        ),
    )
    decoder = Eagle3SpecDecoder(
        target_params, target_config, module, variables,
        capture_layers=capture_layers,
        num_draft_tokens=num_draft_tokens, max_len=256,
    )

    # chat smoke + exact greedy-equivalence per prompt
    accept = []
    for prompt in prompts:
        result = decoder.generate(
            list(prompt), max_new_tokens=max_new_tokens, topk=topk
        )
        oracle = greedy_target_decode(
            target_params, target_config, list(prompt),
            max_new_tokens=max_new_tokens, max_len=256,
        )
        n = min(len(oracle), len(result.output_ids))
        if list(result.output_ids[:n]) != list(oracle[:n]):
            raise SystemExit(
                f"GATE FAILED: spec-decode output diverged from greedy "
                f"target decode\n  spec:   {list(result.output_ids[:n])}\n"
                f"  greedy: {list(oracle[:n])}"
            )
        accept.append(result.mean_accept_length)

    summary = {
        "gate": "serving",
        "status": "pass",
        "prompts": len(prompts),
        "greedy_equivalent": True,
        "mean_accept_length": round(float(np.mean(accept)), 3),
        "topk": topk,
    }
    print(json.dumps(summary))
    return summary


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", help="self-contained mode scratch dir")
    parser.add_argument("--target", help="HF target checkpoint dir")
    parser.add_argument("--export", help="exported sglang-layout draft dir")
    parser.add_argument("--prompts", help="jsonl with {'input_ids': [...]}")
    parser.add_argument("--num-draft-tokens", type=int, default=3)
    parser.add_argument("--topk", type=int, default=1,
                        help="tree width (>1 = tree speculation)")
    args = parser.parse_args()

    if args.target and args.export:
        target_dir, export_dir = args.target, args.export
    elif args.workdir:
        os.makedirs(args.workdir, exist_ok=True)
        target_dir, export_dir = _build_tiny_stack(args.workdir)
    else:
        parser.error("give --workdir (self-contained) or --target + --export")

    if args.prompts:
        prompts = [
            json.loads(line)["input_ids"]
            for line in open(args.prompts)
            if line.strip()
        ]
    else:
        rng = np.random.default_rng(1)
        prompts = [
            rng.integers(1, 100, size=int(rng.integers(8, 16))).tolist()
            for _ in range(2)
        ]
    run_gate(target_dir, export_dir, prompts,
             num_draft_tokens=args.num_draft_tokens, topk=args.topk)


if __name__ == "__main__":
    main()
