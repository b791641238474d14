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

    # deepseek / gptoss variant rows (gathered path — the single-chip form
    # of the multi-variant EP capture, ref schema.py:93-98): same expert
    # scale, each variant's own router + expert math
    from specforge_tpu.models.target.transformer import (
        _moe_deepseek,
        _moe_gptoss,
    )

    ds_cfg = TargetConfig(
        vocab_size=1, hidden_size=h, intermediate_size=inter,
        num_hidden_layers=1, num_attention_heads=1, num_key_value_heads=1,
        num_experts=e, num_experts_per_tok=k, moe_intermediate_size=inter,
        moe_variant="deepseek", scoring_func="sigmoid",
        topk_method="noaux_tc", n_group=8, topk_group=4,
        norm_topk_prob=True, routed_scaling_factor=2.5,
    )
    ds_params = dict(params)
    ds_params["L.mlp.gate.e_score_correction_bias"] = jnp.zeros(
        (e,), jnp.float32
    )
    jitted = jax.jit(lambda p, x: _moe_deepseek(p, ds_cfg, "L", x))
    _ = float(jnp.sum(jitted(ds_params, y).astype(jnp.float32)))
    t0 = time.monotonic()
    for _i in range(10):
        out = jitted(ds_params, y)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt_ds = (time.monotonic() - t0) / 10

    go_cfg = TargetConfig(
        vocab_size=1, hidden_size=h, intermediate_size=inter,
        num_hidden_layers=1, num_attention_heads=1, num_key_value_heads=1,
        num_experts=e, num_experts_per_tok=k, moe_intermediate_size=inter,
        moe_variant="gptoss",
    )
    go_params = {
        "L.mlp.router.weight": params["L.mlp.gate.weight"],
        "L.mlp.router.bias": jnp.zeros((e,), jnp.bfloat16),
        "L.mlp.experts.gate_up_proj": jnp.asarray(
            (rng.normal(size=(e, h, 2 * inter)) * 0.02).astype(np.float32)
        ).astype(jnp.bfloat16),
        "L.mlp.experts.gate_up_proj_bias": jnp.zeros(
            (e, 2 * inter), jnp.bfloat16),
        "L.mlp.experts.down_proj": jnp.asarray(
            (rng.normal(size=(e, inter, h)) * 0.02).astype(np.float32)
        ).astype(jnp.bfloat16),
        "L.mlp.experts.down_proj_bias": jnp.zeros((e, h), jnp.bfloat16),
    }
    jitted = jax.jit(lambda p, x: _moe_gptoss(p, go_cfg, "L", x))
    _ = float(jnp.sum(jitted(go_params, y).astype(jnp.float32)))
    t0 = time.monotonic()
    for _i in range(10):
        out = jitted(go_params, y)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt_go = (time.monotonic() - t0) / 10
    print(json.dumps({
        "metric": "moe_variant_gathered_ms",
        "deepseek_ms": round(dt_ds * 1e3, 2),
        "gptoss_ms": round(dt_go * 1e3, 2),
        "qwen_ms": round(dt_gathered * 1e3, 2),
        "experts": e, "topk": k, "tokens": toks,
    }))


if __name__ == "__main__":
    main()
