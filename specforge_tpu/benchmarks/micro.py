"""Micro-benchmarks for the hot kernels (run on a real TPU chip).

Counterpart of the reference micro-benchmarks
(specforge/benchmarks/benchmark_flex_attention.py / benchmark_loss.py):

    python -m specforge_tpu.benchmarks.micro [--seq 2048] [--batch 2]

Times the fused CE loss (Pallas vs XLA reference) and the TTT branch
attention (pallas kernel vs chunked vs dense XLA), fwd and fwd+bwd.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _timeit(fn, *args, iters=10):
    import jax
    import jax.numpy as jnp

    # Two SEPARATE jits: the measured op keeps its own jit boundary (its
    # outputs are materialized to HBM, same as in a real step — fusing a
    # reduction INTO the measured program would let XLA elide the output
    # write for XLA ops but not for opaque Pallas calls, biasing
    # kernel-vs-XLA comparisons), and a second jit reduces to a scalar so
    # only the scalar crosses the axon tunnel (fetching a 64MB tensor
    # would swamp a 10ms op).
    jitted = jax.jit(fn)
    scalarize = jax.jit(
        lambda out: jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)),
            out, jnp.float32(0.0),
        )
    )
    out = jitted(*args)
    _ = float(scalarize(out))
    t0 = time.monotonic()
    for _ in range(iters):
        out = jitted(*args)
    _ = float(scalarize(out))
    return (time.monotonic() - t0) / iters


def bench_loss(batch, seq, vocab=32000):
    import jax
    import jax.numpy as jnp

    from specforge_tpu.ops.loss import (
        log_softmax_loss,
        log_softmax_loss_reference,
    )

    rng = np.random.default_rng(0)
    logits = jnp.asarray(
        rng.normal(size=(batch, seq, vocab)), jnp.bfloat16
    )
    target = jnp.asarray(rng.random((batch, seq, vocab)), jnp.float32)
    target = target / target.sum(-1, keepdims=True)
    mask = jnp.ones((batch, seq, 1), jnp.int32)

    for name, fn in (
        ("loss fused (pallas on tpu)", log_softmax_loss),
        ("loss xla reference", log_softmax_loss_reference),
    ):
        fwd = _timeit(lambda l, fn=fn: fn(l, target, mask), logits)
        bwd = _timeit(
            lambda l, fn=fn: jax.grad(
                lambda x: fn(x, target, mask)
            )(l),
            logits,
        )
        print(f"{name:34s} fwd {fwd*1e3:7.2f} ms   fwd+bwd {bwd*1e3:7.2f} ms")


def bench_attention(batch, seq, heads=32, kv_heads=8, head_dim=128,
                    n_branches=4):
    import jax
    import jax.numpy as jnp

    from specforge_tpu.ops.attention import (
        make_causal_bias,
        ttt_branch_attention_chunked,
        ttt_branch_attention_reference,
    )
    from specforge_tpu.ops.attention_pallas import ttt_flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(
        rng.normal(size=(batch, heads, seq, head_dim)), jnp.bfloat16
    )
    ks = [jnp.asarray(rng.normal(size=(batch, kv_heads, seq, head_dim)),
                      jnp.bfloat16) for _ in range(n_branches)]
    vs = [jnp.asarray(rng.normal(size=(batch, kv_heads, seq, head_dim)),
                      jnp.bfloat16) for _ in range(n_branches)]
    bias = make_causal_bias(None, batch, seq)

    cases = [
        ("ttt attn pallas", lambda qq: ttt_flash_attention(qq, ks, vs)),
        ("ttt attn chunked xla",
         lambda qq: ttt_branch_attention_chunked(qq, ks, vs, bias)),
    ]
    if seq <= 2048:
        cases.append(
            ("ttt attn dense xla",
             lambda qq: ttt_branch_attention_reference(qq, ks, vs, bias))
        )
    for name, fn in cases:
        fwd = _timeit(fn, q)
        bwd = _timeit(
            lambda qq, fn=fn: jax.grad(
                lambda x: jnp.sum(fn(x).astype(jnp.float32) ** 2)
            )(qq),
            q,
        )
        print(f"{name:34s} fwd {fwd*1e3:7.2f} ms   fwd+bwd {bwd*1e3:7.2f} ms")


def bench_dflash_attention(batch, seq, num_anchors=512, block_size=16,
                           heads=32, kv_heads=8, head_dim=128):
    """Chunked XLA vs Pallas in-kernel-mask DFlash block attention.

    v5e, N=512, fwd+bwd: pallas 0.86x at seq 2048, 2.0x at 4096, 2.9x at
    8192 (the ``attention_backend="auto"`` crossover)."""
    import jax
    import jax.numpy as jnp

    from specforge_tpu.ops.attention import dflash_attention
    from specforge_tpu.ops.dflash_pallas import dflash_flash_attention

    rng = np.random.default_rng(0)
    q_len = num_anchors * block_size
    q = jnp.asarray(
        rng.normal(size=(batch, heads, q_len, head_dim)), jnp.bfloat16
    )
    kc, vc = (jnp.asarray(rng.normal(size=(batch, kv_heads, seq, head_dim)),
                          jnp.bfloat16) for _ in range(2))
    kd, vd = (jnp.asarray(rng.normal(size=(batch, kv_heads, q_len, head_dim)),
                          jnp.bfloat16) for _ in range(2))
    anchors = jnp.asarray(
        np.sort(rng.integers(1, seq - 1, size=(batch, num_anchors)), axis=1)
        .astype(np.int32)
    )
    keep = jnp.ones((batch, num_anchors), bool)

    cases = [
        ("dflash attn chunked xla", lambda qq: dflash_attention(
            qq, kc, vc, kd, vd, anchors, keep, block_size, chunk_blocks=8)),
        ("dflash attn pallas", lambda qq: dflash_flash_attention(
            qq, kc, vc, kd, vd, anchors, keep, block_size)),
    ]
    for name, fn in cases:
        fwd = _timeit(fn, q)
        bwd = _timeit(
            lambda qq, fn=fn: jax.grad(
                lambda x: jnp.sum(fn(x).astype(jnp.float32) ** 2)
            )(qq),
            q,
        )
        print(f"{name:34s} fwd {fwd*1e3:7.2f} ms   fwd+bwd {bwd*1e3:7.2f} ms")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--seq", type=int, default=2048)
    parser.add_argument("--vocab", type=int, default=32000)
    parser.add_argument("--num-anchors", type=int, default=512)
    parser.add_argument("--skip-loss", action="store_true")
    parser.add_argument("--skip-attention", action="store_true")
    parser.add_argument("--skip-dflash-attention", action="store_true")
    args = parser.parse_args()
    if not args.skip_loss:
        bench_loss(args.batch, args.seq, args.vocab)
    if not args.skip_attention:
        bench_attention(args.batch, args.seq)
    if not args.skip_dflash_attention:
        bench_dflash_attention(args.batch, args.seq, args.num_anchors)


if __name__ == "__main__":
    main()
