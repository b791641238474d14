#!/usr/bin/env python
"""DFlash-family serving gate: export(sglang) → reload → block speculation
with the greedy-equivalence invariant.

The reference runs a normalized DFlash/DSpark export inside a live SGLang
server (scripts/gates/run_dflash_chat_serving_gate.py +
normalize_dflash_export.py); the TPU-native equivalent reloads the export
through the production loader (benchmarks/accept_length.py
load_exported_dflash_draft) and drives block speculative decoding
(inference/spec_decode.py DFlashSpecDecoder) — any export drift (missing
head keys, bad config normalization, broken reverse key mapping) breaks the
load or the exact greedy-equivalence check.

Usage:
    python scripts/gates/dflash_serving_gate.py --target <hf_dir> \
        --export <dir> [--prompts prompts.jsonl] [--max-new-tokens 16]
Exit 0 = gate passed; prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402


def run_gate(target_dir: str, export_dir: str, prompts, *,
             max_new_tokens: int = 16):
    import jax.numpy as jnp

    from specforge_tpu.benchmarks.accept_length import (
        load_exported_dflash_draft,
    )
    from specforge_tpu.inference.spec_decode import (
        DFlashSpecDecoder,
        greedy_target_decode,
    )
    from specforge_tpu.models.target.transformer import (
        TargetConfig,
        load_target_params,
    )

    # fp32 target so greedy equivalence is exact (see serving_gate.py)
    target_config = TargetConfig.from_file(target_dir)
    target_params = load_target_params(
        target_dir, target_config, dtype=jnp.float32
    )
    module, variables = load_exported_dflash_draft(export_dir)
    decoder = DFlashSpecDecoder(
        target_params, target_config, module, variables, max_len=256,
    )

    accept = []
    for prompt in prompts:
        result = decoder.generate(list(prompt), max_new_tokens=max_new_tokens)
        oracle = greedy_target_decode(
            target_params, target_config, list(prompt),
            max_new_tokens=max_new_tokens, max_len=256,
        )
        n = min(len(oracle), len(result.output_ids))
        if list(result.output_ids[:n]) != list(oracle[:n]):
            raise SystemExit(
                f"GATE FAILED: block spec-decode diverged from greedy "
                f"target decode\n  spec:   {list(result.output_ids[:n])}\n"
                f"  greedy: {list(oracle[:n])}"
            )
        accept.append(result.mean_accept_length)

    summary = {
        "gate": "dflash_serving",
        "status": "pass",
        "projector": module.config.projector_type or "dflash",
        "prompts": len(prompts),
        "greedy_equivalent": True,
        "mean_accept_length": round(float(np.mean(accept)), 3),
        "block_size": module.config.block_size,
    }
    print(json.dumps(summary))
    return summary


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--target", required=True)
    parser.add_argument("--export", required=True)
    parser.add_argument("--prompts", help="jsonl with {'input_ids': [...]}")
    parser.add_argument("--max-new-tokens", type=int, default=16)
    args = parser.parse_args()

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
    run_gate(args.target, args.export, prompts,
             max_new_tokens=args.max_new_tokens)


if __name__ == "__main__":
    main()
