"""MoE capture-forward micro-benchmark: dense scan vs ragged_dot gather.

Qwen3-30B-A3B-shaped MoE layer (128 experts, top-8, moe_inter 768): the
gather-by-expert path's FLOPs ∝ top-k (VERDICT item 8). Run on TPU:

    python -m specforge_tpu.benchmarks.moe_micro
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from specforge_tpu.models.target.transformer import (
        TargetConfig,
        _moe_mlp_dense,
        _moe_mlp_gathered,
    )

    e = int(os.environ.get("MOE_EXPERTS", "128"))
    k = int(os.environ.get("MOE_TOPK", "8"))
    h = int(os.environ.get("MOE_HIDDEN", "2048"))
    inter = int(os.environ.get("MOE_INTER", "768"))
    toks = int(os.environ.get("MOE_TOKENS", "2048"))
    cfg = TargetConfig(
        vocab_size=1, hidden_size=h, intermediate_size=inter,
        num_hidden_layers=1, num_attention_heads=1, num_key_value_heads=1,
        num_experts=e, num_experts_per_tok=k, moe_intermediate_size=inter,
        norm_topk_prob=True,
    )
    rng = np.random.default_rng(0)
    params = {"L.mlp.gate.weight": jnp.asarray(
        (rng.normal(size=(e, h)) * 0.02).astype(np.float32)
    ).astype(jnp.bfloat16)}
    for i in range(e):
        for name, shape in (("gate_proj", (inter, h)), ("up_proj", (inter, h)),
                            ("down_proj", (h, inter))):
            params[f"L.mlp.experts.{i}.{name}.weight"] = jnp.asarray(
                (rng.normal(size=shape) * 0.02).astype(np.float32)
            ).astype(jnp.bfloat16)
    y = jnp.asarray(
        rng.normal(size=(1, toks, h)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def bench(fn, label, reps=10):
        jitted = jax.jit(lambda p, x: fn(p, cfg, "L", x))
        out = jitted(params, y)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.monotonic()
        for _i in range(reps):
            out = jitted(params, y)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.monotonic() - t0) / reps
        print(f"{label}: {dt*1e3:.2f} ms", file=sys.stderr)
        return dt

    dt_dense = bench(_moe_mlp_dense, "dense-scan")
    dt_gathered = bench(_moe_mlp_gathered, "ragged-gather")
    print(json.dumps({
        "metric": "moe_gather_speedup_vs_dense",
        "value": round(dt_dense / dt_gathered, 2),
        "unit": "x",
        "dense_ms": round(dt_dense * 1e3, 2),
        "gathered_ms": round(dt_gathered * 1e3, 2),
        "experts": e, "topk": k, "tokens": toks,
    }))


if __name__ == "__main__":
    main()
