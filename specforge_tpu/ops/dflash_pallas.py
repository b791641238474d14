"""Pallas TPU flash attention for DFlash block decoding (in-kernel masks).

The DFlash mask predicate (reference flex-attention ``dflash_mask_mod``,
specforge/algorithms/common/dflash_family_model.py:91-133): draft query row
``r`` in anchor block ``n`` (offset ``o = r % block_size``) attends to

  * context keys ``j < a_n`` — optionally bounded below by the sliding window
    ``j >= a_n + o - (w - 1)``;
  * its own block's draft keys — all of them, or ``kv_off <= o`` under a
    sliding-window layer;

and nothing if block ``n`` was not kept. The XLA path
(:func:`specforge_tpu.ops.attention.dflash_attention`) materializes a
``[B, chunk, S+chunk]`` boolean mask per anchor chunk; here the predicate is
computed *inside the kernel* from the per-row anchor vector (SURVEY §2.9 #5 /
§7 step 6, VERDICT W3), with two structural wins a mask array cannot express:

  * **context-tile skipping** — anchors are sorted ascending, so a q tile
    whose max anchor is below a K tile's first column skips that tile's
    matmul entirely (~2x on the context attention work), and a sliding layer
    additionally skips tiles below every row's window;
  * the draft-block diagonal is q-aligned, so each q tile folds exactly its
    own ``[tq, tq]`` draft slice into the online-softmax statistics at the
    last K step — the draft keys are never concatenated to the context.

Layouts (GQA pre-expanded to full heads by the wrapper, as in
:mod:`specforge_tpu.ops.attention_pallas`):
    q, k_drf, v_drf      [BH, Q, D]   (Q = num_anchors * block_size)
    k_ctx, v_ctx         [BH, S, D]
    anchor_q, keep_q     [BH, 1, Q] int32 (per-row anchor / keep)
    amax, amin           [BH, NQ] int32 in SMEM (per-q-tile skip bounds)

Forward saves per-row (m, l); backward recomputes probabilities tile-by-tile
(dq + draft-key grads q-aligned; then context dk/dv with q innermost) — the
same flash backward split as the TTT kernel.

Measured (v5e, b1 h32/kvh8 d128, 512 anchors, fwd+bwd vs the chunked XLA
path): 0.86x at S=2048, 2.0x at S=4096, 2.9x at S=8192 — below ~4k the
attention is too small for a kernel to beat XLA's fused einsums (grid-step
overhead dominates); above it, in-kernel masking + context-tile skipping win.
``DFlashAttention`` dispatches on this crossover under
``attention_backend="auto"``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# Lane width for the per-row (m, l, delta) statistics arrays. 8 (not 128):
# Mosaic accepts a block lane dim below 128 when it equals the array's lane
# dim, and Q here is num_anchors*block_size (8192 at the reference config) —
# 8 lanes keeps the stat arrays/broadcasts 16x smaller than the TTT kernel's
# 128-lane convention. Scratch accumulators stay at 128 lanes (VMEM-only).
STAT = 8
STAT_ACC = 128
# DFlash attention is compute-light (the vocab path dominates the algorithm),
# so grid-step overhead — not FLOPs — sets the kernel's cost: use large tiles
# to keep the step count low. r5: the kernels request a raised scoped-vmem
# budget (see VMEM_LIMIT — Mosaic's 16M default was the old (1024, 512)
# blocker; v5e has 128M physical), and the env knobs below allow sweeps.
import os as _os

DEF_TQ = int(_os.environ.get("SPECFORGE_DFLASH_TQ", "1024"))
DEF_TK = int(_os.environ.get("SPECFORGE_DFLASH_TK", "512"))
VMEM_LIMIT = int(_os.environ.get("SPECFORGE_TTT_VMEM_MB", "96")) * 1024 * 1024


def _ctx_allow(anchors, keep, o_vec, j, tq, tk, sliding):
    """[tq, tk] context allowance for K tile ``j`` from per-row anchors."""
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1) + j * tk
    allow = col < anchors[:, None]
    if sliding is not None:
        lower = anchors[:, None] + o_vec[:, None] - (sliding - 1)
        allow = allow & (col >= lower)
    return allow & (keep[:, None] != 0)


def _draft_allow(keep, o_vec, tq, block_size, sliding):
    """[tq, tq] same-block draft allowance (q-aligned draft tile)."""
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (tq, tq), 0) // block_size
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (tq, tq), 1) // block_size
    allow = row_blk == col_blk
    if sliding is not None:
        allow = allow & (o_vec[None, :] <= o_vec[:, None])
    return allow & (keep[:, None] != 0)


def _offsets(tq, block_size):
    return jax.lax.iota(jnp.int32, tq) % block_size


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(amax_ref, amin_ref, q_ref, k_ref, v_ref, kd_ref, vd_ref,
                anchor_ref, keep_ref, o_ref, m_ref, l_ref,
                m_acc, l_acc, o_acc,
                *, scale, tq, tk, block_size, sliding):
    bh, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_acc[...] = jnp.full_like(m_acc, NEG_INF)
        l_acc[...] = jnp.zeros_like(l_acc)
        o_acc[...] = jnp.zeros_like(o_acc)

    o_vec = _offsets(tq, block_size)

    # tile skip: cols [j*tk, (j+1)*tk) useful iff j*tk < amax and (sliding)
    # the tile's last col reaches the lowest window bound
    useful = j * tk < amax_ref[bh, i]
    if sliding is not None:
        useful = jnp.logical_and(useful, (j + 1) * tk > amin_ref[bh, i])

    @pl.when(useful)
    def _attend():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        allow = _ctx_allow(
            anchor_ref[0, 0], keep_ref[0, 0], o_vec, j, tq, tk, sliding
        )
        s = jnp.where(allow, s, NEG_INF)
        m_old = m_acc[:, 0:1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(allow, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m_old - m_new)
        l_acc[...] = jnp.broadcast_to(
            l_acc[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True),
            l_acc.shape,
        )
        o_acc[...] = o_acc[...] * corr + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_acc[...] = jnp.broadcast_to(m_new, m_acc.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        q = q_ref[0].astype(jnp.float32)
        kd = kd_ref[0].astype(jnp.float32)
        vd = vd_ref[0].astype(jnp.float32)
        s_d = jax.lax.dot_general(
            q, kd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        allow = _draft_allow(keep_ref[0, 0], o_vec, tq, block_size, sliding)
        s_d = jnp.where(allow, s_d, NEG_INF)
        m_old = m_acc[:, 0:1]
        m = jnp.maximum(m_old, jnp.max(s_d, axis=1, keepdims=True))
        p = jnp.where(allow, jnp.exp(s_d - m), 0.0)
        corr = jnp.exp(m_old - m)
        l = l_acc[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
        o = o_acc[...] * corr + jax.lax.dot_general(
            p, vd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        m_ref[0] = jnp.broadcast_to(m, (tq, STAT)).astype(jnp.float32)
        l_ref[0] = jnp.broadcast_to(l, (tq, STAT)).astype(jnp.float32)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------

def _bwd_dq_kernel(amax_ref, amin_ref, q_ref, k_ref, v_ref, kd_ref, vd_ref,
                   anchor_ref, keep_ref, m_ref, l_ref, do_ref, delta_ref,
                   dq_ref, dkd_ref, dvd_ref, dq_acc,
                   *, scale, tq, tk, block_size, sliding):
    bh, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    o_vec = _offsets(tq, block_size)
    q = q_ref[0].astype(jnp.float32)
    m = m_ref[0][:, 0:1]
    l = jnp.maximum(l_ref[0][:, 0:1], 1e-30)
    do = do_ref[0].astype(jnp.float32)
    delta = delta_ref[0][:, 0:1]

    useful = j * tk < amax_ref[bh, i]
    if sliding is not None:
        useful = jnp.logical_and(useful, (j + 1) * tk > amin_ref[bh, i])

    @pl.when(useful)
    def _attend():
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        allow = _ctx_allow(
            anchor_ref[0, 0], keep_ref[0, 0], o_vec, j, tq, tk, sliding
        )
        p = jnp.where(allow, jnp.exp(s - m) / l, 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dq_acc[...] = dq_acc[...] + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(j == nk - 1)
    def _finalize():
        kd = kd_ref[0].astype(jnp.float32)
        vd = vd_ref[0].astype(jnp.float32)
        s_d = jax.lax.dot_general(
            q, kd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        allow = _draft_allow(keep_ref[0, 0], o_vec, tq, block_size, sliding)
        p = jnp.where(allow, jnp.exp(s_d - m) / l, 0.0)
        dp = jax.lax.dot_general(
            do, vd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dq_ref[0] = (dq_acc[...] + jax.lax.dot_general(
            ds, kd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dq_ref.dtype)
        # draft keys are q-aligned: this tile owns their grads exclusively
        dkd_ref[0] = (jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dkd_ref.dtype)
        dvd_ref[0] = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dvd_ref.dtype)


def _bwd_dkv_kernel(amax_ref, amin_ref, q_ref, k_ref, v_ref, anchor_ref,
                    keep_ref, m_ref, l_ref, do_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc,
                    *, scale, tq, tk, block_size, sliding):
    # grid: (bh, k_tile, q_tile) — q innermost accumulates
    bh, jk, iq = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    o_vec = _offsets(tq, block_size)
    useful = jk * tk < amax_ref[bh, iq]
    if sliding is not None:
        useful = jnp.logical_and(useful, (jk + 1) * tk > amin_ref[bh, iq])

    @pl.when(useful)
    def _attend():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        m = m_ref[0][:, 0:1]
        l = jnp.maximum(l_ref[0][:, 0:1], 1e-30)
        do = do_ref[0].astype(jnp.float32)
        delta = delta_ref[0][:, 0:1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        allow = _ctx_allow(
            anchor_ref[0, 0], keep_ref[0, 0], o_vec, jk, tq, tk, sliding
        )
        p = jnp.where(allow, jnp.exp(s - m) / l, 0.0)
        dv_acc[...] = dv_acc[...] + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dk_acc[...] = dk_acc[...] + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


# --------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# --------------------------------------------------------------------------

def _specs(tq, tk, d):
    q_spec = pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, tq), lambda b, i, j: (b, 0, i),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, tq, STAT), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return q_spec, k_spec, row_spec, stat_spec, smem_spec


def _fwd_pallas(q, k_ctx, v_ctx, kd, vd, anchor_q, keep_q, amax, amin,
                *, block_size, sliding, tq, tk, interpret):
    bh, q_len, d = q.shape
    s = k_ctx.shape[1]
    scale = 1.0 / (d ** 0.5)
    grid = (bh, q_len // tq, pl.cdiv(s, tk))
    q_spec, k_spec, row_spec, stat_spec, smem_spec = _specs(tq, tk, d)
    out, m, l = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, tq=tq, tk=tk, block_size=block_size,
            sliding=sliding,
        ),
        grid=grid,
        in_specs=[smem_spec, smem_spec, q_spec, k_spec, k_spec, q_spec,
                  q_spec, row_spec, row_spec],
        out_specs=[q_spec, stat_spec, stat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, q_len, d), q.dtype),
            jax.ShapeDtypeStruct((bh, q_len, STAT), jnp.float32),
            jax.ShapeDtypeStruct((bh, q_len, STAT), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, STAT_ACC), jnp.float32),
            pltpu.VMEM((tq, STAT_ACC), jnp.float32),
            pltpu.VMEM((tq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(amax, amin, q, k_ctx, v_ctx, kd, vd, anchor_q, keep_q)
    return out, m[..., :1], l[..., :1]


def _bwd_pallas(q, k_ctx, v_ctx, kd, vd, anchor_q, keep_q, amax, amin,
                m, l, out, do, *, block_size, sliding, tq, tk, interpret):
    bh, q_len, d = q.shape
    s = k_ctx.shape[1]
    scale = 1.0 / (d ** 0.5)
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    m_b = jnp.broadcast_to(m, (bh, q_len, STAT))
    l_b = jnp.broadcast_to(l, (bh, q_len, STAT))
    delta_b = jnp.broadcast_to(delta, (bh, q_len, STAT))
    q_spec, k_spec, row_spec, stat_spec, smem_spec = _specs(tq, tk, d)

    grid_q = (bh, q_len // tq, pl.cdiv(s, tk))
    dq, dkd, dvd = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, tq=tq, tk=tk, block_size=block_size,
            sliding=sliding,
        ),
        grid=grid_q,
        in_specs=[smem_spec, smem_spec, q_spec, k_spec, k_spec, q_spec,
                  q_spec, row_spec, row_spec, stat_spec, stat_spec, q_spec,
                  stat_spec],
        out_specs=[q_spec, q_spec, q_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, q_len, d), q.dtype),
            jax.ShapeDtypeStruct((bh, q_len, d), q.dtype),
            jax.ShapeDtypeStruct((bh, q_len, d), q.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((tq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(amax, amin, q, k_ctx, v_ctx, kd, vd, anchor_q, keep_q, m_b, l_b, do,
      delta_b)

    # context dk/dv: k tiles outer, q tiles innermost accumulate
    qi_spec = pl.BlockSpec((1, tq, d), lambda b, jk, iq: (b, iq, 0),
                           memory_space=pltpu.VMEM)
    ki_spec = pl.BlockSpec((1, tk, d), lambda b, jk, iq: (b, jk, 0),
                           memory_space=pltpu.VMEM)
    rowi_spec = pl.BlockSpec((1, 1, tq), lambda b, jk, iq: (b, 0, iq),
                             memory_space=pltpu.VMEM)
    stati_spec = pl.BlockSpec((1, tq, STAT), lambda b, jk, iq: (b, iq, 0),
                              memory_space=pltpu.VMEM)
    grid_k = (bh, pl.cdiv(s, tk), q_len // tq)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, tq=tq, tk=tk,
            block_size=block_size, sliding=sliding,
        ),
        grid=grid_k,
        in_specs=[smem_spec, smem_spec, qi_spec, ki_spec, ki_spec, rowi_spec,
                  rowi_spec, stati_spec, stati_spec, qi_spec, stati_spec],
        out_specs=[ki_spec, ki_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, d), jnp.float32),
            pltpu.VMEM((tk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(amax, amin, q, k_ctx, v_ctx, anchor_q, keep_q, m_b, l_b, do, delta_b)
    return dq, dk, dv, dkd, dvd


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _dflash_flash_flat(q, k_ctx, v_ctx, kd, vd, anchor_q, keep_q, amax, amin,
                       block_size, sliding, tq, tk, interpret):
    out, _, _ = _fwd_pallas(
        q, k_ctx, v_ctx, kd, vd, anchor_q, keep_q, amax, amin,
        block_size=block_size, sliding=sliding, tq=tq, tk=tk,
        interpret=interpret,
    )
    return out


def _flat_fwd(q, k_ctx, v_ctx, kd, vd, anchor_q, keep_q, amax, amin,
              block_size, sliding, tq, tk, interpret):
    out, m, l = _fwd_pallas(
        q, k_ctx, v_ctx, kd, vd, anchor_q, keep_q, amax, amin,
        block_size=block_size, sliding=sliding, tq=tq, tk=tk,
        interpret=interpret,
    )
    return out, (q, k_ctx, v_ctx, kd, vd, anchor_q, keep_q, amax, amin, m, l,
                 out)


def _flat_bwd(block_size, sliding, tq, tk, interpret, res, do):
    (q, k_ctx, v_ctx, kd, vd, anchor_q, keep_q, amax, amin, m, l, out) = res
    dq, dk, dv, dkd, dvd = _bwd_pallas(
        q, k_ctx, v_ctx, kd, vd, anchor_q, keep_q, amax, amin, m, l, out, do,
        block_size=block_size, sliding=sliding, tq=tq, tk=tk,
        interpret=interpret,
    )
    return dq, dk, dv, dkd, dvd, None, None, None, None


_dflash_flash_flat.defvjp(_flat_fwd, _flat_bwd)


def dflash_flash_attention(
    q: jnp.ndarray,                  # [B, H, Q, D]
    k_ctx: jnp.ndarray,              # [B, KVH, S, D]
    v_ctx: jnp.ndarray,
    k_drf: jnp.ndarray,              # [B, KVH, Q, D]
    v_drf: jnp.ndarray,
    anchor_positions: jnp.ndarray,   # [B, N] sorted ascending
    block_keep_mask: jnp.ndarray,    # [B, N] bool
    block_size: int,
    sliding_window: Optional[int] = None,
    tq: int = DEF_TQ,
    tk: int = DEF_TK,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """DFlash block attention with the mask computed in-kernel.

    Returns ``[B, Q, H*D]``, or ``None`` when the shape doesn't tile (caller
    falls back to the chunked XLA path).
    """
    b, h, q_len, d = q.shape
    kvh = k_ctx.shape[1]
    g = h // kvh
    s = k_ctx.shape[2]
    n = anchor_positions.shape[1]

    # q tile: a multiple of block_size that divides q_len, close to ``tq``
    if q_len < tq:
        tq = q_len
    if tq % block_size != 0 or q_len % tq != 0:
        cand = (tq // block_size) * block_size
        while cand >= block_size and q_len % cand != 0:
            cand -= block_size
        if cand < block_size:
            return None
        tq = cand
    tk = min(tk, max(s, 8))

    def flat(x):
        if x.shape[1] != h:
            x = jnp.repeat(x, g, axis=1)
        return x.reshape(b * h, x.shape[2], d)

    qf, kcf, vcf = flat(q), flat(k_ctx), flat(v_ctx)
    kdf, vdf = flat(k_drf), flat(v_drf)
    # pad context K/V to a tk multiple with zeros: Pallas edge-tile padding is
    # undefined bits, and masked p=0 times a NaN value is still NaN in the
    # p@v / do@v^T matmuls. Zero keys/values are inert (cols >= s are masked
    # by col < anchor), and jnp.pad's VJP slices the dk/dv tail off.
    s_pad = -(-s // tk) * tk
    if s_pad != s:
        pad = ((0, 0), (0, s_pad - s), (0, 0))
        kcf = jnp.pad(kcf, pad)
        vcf = jnp.pad(vcf, pad)

    anchor_q = jnp.repeat(anchor_positions, block_size, axis=1)  # [B, Q]
    keep_q = jnp.repeat(
        block_keep_mask.astype(jnp.int32), block_size, axis=1
    )
    o_vec = jnp.tile(
        jnp.arange(block_size, dtype=jnp.int32), q_len // block_size
    )
    nq = q_len // tq
    # per-q-tile bounds for context-tile skipping (keep-masked rows excluded)
    a_eff = jnp.where(keep_q > 0, anchor_q, 0)
    amax = jnp.max(a_eff.reshape(b, nq, tq), axis=2)            # [B, NQ]
    if sliding_window is not None:
        lower = anchor_q + o_vec[None, :] - (sliding_window - 1)
        lower = jnp.where(keep_q > 0, lower, jnp.int32(2 ** 30))
        amin = jnp.min(lower.reshape(b, nq, tq), axis=2)
        amin = jnp.maximum(amin, 0)
    else:
        amin = jnp.zeros((b, nq), jnp.int32)

    def expand_rows(x):  # [B, Q] -> [BH, 1, Q]
        return jnp.repeat(x, h, axis=0).reshape(b * h, 1, x.shape[1])

    anchor_f = expand_rows(anchor_q)
    keep_f = expand_rows(keep_q)
    amax_f = jnp.repeat(amax, h, axis=0).reshape(b * h, nq)
    amin_f = jnp.repeat(amin, h, axis=0).reshape(b * h, nq)

    out = _dflash_flash_flat(
        qf, kcf, vcf, kdf, vdf, anchor_f, keep_f, amax_f, amin_f,
        block_size, sliding_window, tq, tk, interpret,
    )
    out = out.reshape(b, h, q_len, d)
    out = out * keep_q[:, None, :, None].astype(out.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, q_len, h * d)
