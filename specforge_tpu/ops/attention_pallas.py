"""Pallas TPU flash attention for the EAGLE3 TTT branch merge.

The SURVEY's headline custom kernel (§7 hard parts #1): step t of the TTT
unroll attends fully-causally to the step-0 K/V **plus one diagonal key per
earlier TTT branch**, normalized by one joint softmax. No off-the-shelf kernel
has this shape; here the causal block streams K tiles with the online-softmax
(m, l, o) recurrence and the per-branch diagonal logits fold into the same
statistics at the last K tile — they are query-aligned, so each Q tile only
touches its own branch slice.

Layouts (GQA pre-expanded to full heads by the wrapper):
    q, k0, v0      [BH, S, D]
    branches       [NB, BH, S, D] (NB may be 0)
    key_valid      [BH, S] int32 (1 = attendable)

Forward saves the per-row softmax statistics ``m`` (max) and ``l`` (sumexp);
the backward pass recomputes probabilities tile-by-tile in two passes (dq +
branch grads; then dk/dv) — the standard flash-attention backward split, with
``delta = rowsum(do · o)`` computed in XLA.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
DEF_TQ = 256
DEF_TK = 256
STAT = 128  # lanes for per-row statistics buffers
#: scoped-vmem budget for the TTT kernels. The 16M Mosaic default is what
#: capped r4 at 512-row tiles and 59.5-62.3% MFU at long context — v5e has
#: 128M of physical VMEM and the scoped stack is per-kernel, so raising it
#: is nearly free. 96M admits the 2048-wide tiles below (fp32 score tile
#: 2048x2048 = 16M plus double-buffered branch blocks) while leaving 32M
#: for Mosaic's own pipelining buffers. Measured r5 (eagle3 ttt7 fwd+bwd):
#: s768 63.8→66.3, s1024 65.5→67.0, s2048 62.3→67.1, s4096 59.5→65.8%.
VMEM_LIMIT = int(os.environ.get("SPECFORGE_TTT_VMEM_MB", "96")) * 1024 * 1024


def _env_tiles(tq, tk, seq_len: int = 0):
    """Resolve TTT-kernel tile sizes: explicit args win, then the
    SPECFORGE_TTT_TQ/TK env knobs (perf sweeps), then a seq-adaptive
    default — bigger tiles amortize grid-step overhead once the context
    fills them, and with the 96M scoped-vmem budget (``VMEM_LIMIT``) the
    2048-wide tiles are legal everywhere. Measured on v5e, eagle3 ttt7
    fwd+bwd MFU (r5 sweep): s768 66.3% @768×768 (was 63.8 @256),
    s1024 67.0% @1024×1024 (was 65.5 @512), s2048 67.1% @2048×2048 (was
    62.3 @1024×512), s4096 65.8% @1024×2048 ≈ 2048×2048 (was 59.5 @512 —
    the old 16M limit forced the drop; packed [8,tq] stat buffers cut the
    rest). Very short contexts keep 256 (a wash there)."""
    import os

    def_q, def_k = DEF_TQ, DEF_TK
    if seq_len >= 4096:
        def_q, def_k = 1024, 2048
    elif seq_len >= 2048:
        def_q = def_k = 2048
    elif seq_len >= 1024:
        def_q = def_k = 1024
    elif seq_len >= 768:
        def_q = def_k = 768
    if tq is None:
        tq = int(os.environ.get("SPECFORGE_TTT_TQ", def_q))
    if tk is None:
        tk = int(os.environ.get("SPECFORGE_TTT_TK", def_k))
    return tq, tk


def _row_ids(tq, tk, i, j):
    row = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0) + i * tq
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1) + j * tk
    return row, col


def _unpack_stat(ref):
    """Packed [8, tq] stat row → [tq, 1] column via a rank-1 MXU dot (a
    VPU lane↔sublane relayout would cost multi-MB of kernel stack)."""
    row = ref[0, 0:1, :].astype(jnp.float32)          # (1, tq)
    return jax.lax.dot_general(
        row, jnp.ones((1, 1), jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (tq, 1)


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, kb_ref, vb_ref, valid_ref,
                o_ref, m_ref, l_ref,
                m_acc, l_acc, o_acc,
                *, scale, n_branches, tq, tk, seq_len):
    i, j = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_acc[...] = jnp.full_like(m_acc, NEG_INF)
        l_acc[...] = jnp.zeros_like(l_acc)
        o_acc[...] = jnp.zeros_like(o_acc)

    # causal tile skip: tile contributes iff its first key col <= last q row
    @pl.when(j * tk <= i * tq + tq - 1)
    def _attend():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        row, col = _row_ids(tq, tk, i, j)
        allow = (col <= row) & (col < seq_len)
        allow = allow & (valid_ref[0, 0] != 0)[None, :]
        s = jnp.where(allow, s, NEG_INF)

        m_old = m_acc[:, 0:1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(allow, p, 0.0)
        corr = jnp.exp(m_old - m_new)
        l_new = l_acc[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
        o_acc[...] = o_acc[...] * corr + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_acc[...] = jnp.broadcast_to(m_new, m_acc.shape)
        l_acc[...] = jnp.broadcast_to(l_new, l_acc.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        q = q_ref[0].astype(jnp.float32)
        m = m_acc[:, 0:1]
        l = l_acc[:, 0:1]
        o = o_acc[...]
        for b in range(n_branches):
            kb = kb_ref[b, 0].astype(jnp.float32)
            vb = vb_ref[b, 0].astype(jnp.float32)
            wi = jnp.sum(q * kb, axis=1, keepdims=True) * scale
            m_new = jnp.maximum(m, wi)
            corr = jnp.exp(m - m_new)
            p = jnp.exp(wi - m_new)
            l = l * corr + p
            o = o * corr + p * vb
            m = m_new
        o_ref[0] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        # PACKED stat layout [8, tq] (8-sublane minimum) instead of
        # [tq, STAT=128] — 16x less stat VMEM, which is what lets 1024-row
        # q tiles fit the 16M scoped-vmem limit at s4096 (VERDICT r4 W1).
        # The (tq,1)→(8,tq) transpose rides a rank-1 MXU dot: a VPU
        # sublane↔lane relayout here costs multi-MB of kernel stack.
        ones8 = jnp.ones((8, 1), jnp.float32)
        m_ref[0] = jax.lax.dot_general(
            ones8, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l_ref[0] = jax.lax.dot_general(
            ones8, l, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _fwd_pallas(q, k0, v0, kb, vb, key_valid, *, n_branches, tq, tk,
                interpret):
    bh, s, d = q.shape
    nb = n_branches  # kb is zero-padded to >=1; fold only the real branches
    scale = 1.0 / (d ** 0.5)
    grid = (bh, pl.cdiv(s, tq), pl.cdiv(s, tk))
    kernel = functools.partial(
        _fwd_kernel, scale=scale, n_branches=nb, tq=tq, tk=tk, seq_len=s,
    )
    q_spec = pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    br_spec = pl.BlockSpec((kb.shape[0], 1, tq, d),
                           lambda b, i, j: (0, b, i, 0),
                           memory_space=pltpu.VMEM)
    valid_spec = pl.BlockSpec((1, 1, tk), lambda b, i, j: (b, 0, j),
                              memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 8, tq), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM)
    out, m, l = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, k_spec, k_spec, br_spec, br_spec, valid_spec],
        out_specs=[
            pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            stat_spec, stat_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 8, s), jnp.float32),
            jax.ShapeDtypeStruct((bh, 8, s), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, STAT), jnp.float32),
            pltpu.VMEM((tq, STAT), jnp.float32),
            pltpu.VMEM((tq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(q, k0, v0, kb, vb, key_valid)
    return out, m, l  # stats packed [BH, 8, S]


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, kb_ref, vb_ref, valid_ref,
                   m_ref, l_ref, do_ref, delta_ref,
                   dq_ref, dkb_ref, dvb_ref,
                   dq_acc,
                   *, scale, n_branches, tq, tk, seq_len):
    i, j = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0].astype(jnp.float32)
    m = _unpack_stat(m_ref)                       # packed [8, tq] stats
    l = jnp.maximum(_unpack_stat(l_ref), 1e-30)
    do = do_ref[0].astype(jnp.float32)
    delta = _unpack_stat(delta_ref)

    @pl.when(j * tk <= i * tq + tq - 1)
    def _attend():
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        row, col = _row_ids(tq, tk, i, j)
        allow = (col <= row) & (col < seq_len)
        allow = allow & (valid_ref[0, 0] != 0)[None, :]
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
        dq = dq_acc[...]
        for b in range(n_branches):
            kb = kb_ref[b, 0].astype(jnp.float32)
            vb = vb_ref[b, 0].astype(jnp.float32)
            wi = jnp.sum(q * kb, axis=1, keepdims=True) * scale
            pb = jnp.exp(wi - m) / l
            dpb = jnp.sum(do * vb, axis=1, keepdims=True)
            dsb = pb * (dpb - delta)
            dq = dq + dsb * kb * scale
            dkb_ref[b, 0] = (dsb * q * scale).astype(dkb_ref.dtype)
            dvb_ref[b, 0] = (pb * do).astype(dvb_ref.dtype)
        dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, valid_ref, m_ref, l_ref, do_ref,
                    delta_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                    *, scale, tq, tk, seq_len):
    # grid: (bh, k_tile, q_tile) — q innermost accumulates
    jk, iq = pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    # causal: q tile contributes iff its last row >= tile's first key col
    @pl.when(iq * tq + tq - 1 >= jk * tk)
    def _attend():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        m = _unpack_stat(m_ref)                   # packed [8, tq] stats
        l = jnp.maximum(_unpack_stat(l_ref), 1e-30)
        do = do_ref[0].astype(jnp.float32)
        delta = _unpack_stat(delta_ref)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        row, col = _row_ids(tq, tk, iq, jk)
        allow = (col <= row) & (col < seq_len)
        allow = allow & (valid_ref[0, 0] != 0)[None, :]
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


def _bwd_pallas(q, k0, v0, kb, vb, key_valid, m, l, out, do,
                *, n_branches, tq, tk, interpret):
    bh, s, d = q.shape
    nb = n_branches
    scale = 1.0 / (d ** 0.5)
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
    )
    # stats ride PACKED [BH, 8, S] (m/l arrive packed from the forward);
    # delta joins the same layout — 16x less stat VMEM than the old
    # [S, STAT=128] broadcast, the enabler for 1024-row tiles at s4096
    m_b, l_b = m, l
    delta_b = jnp.broadcast_to(delta[:, None, :], (bh, 8, s))

    q_spec = pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    br_spec = pl.BlockSpec((kb.shape[0], 1, tq, d),
                           lambda b, i, j: (0, b, i, 0),
                           memory_space=pltpu.VMEM)
    validq_spec = pl.BlockSpec((1, 1, tk), lambda b, i, j: (b, 0, j),
                               memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 8, tq), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM)

    grid_q = (bh, pl.cdiv(s, tq), pl.cdiv(s, tk))
    dq, dkb, dvb = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, n_branches=nb, tq=tq, tk=tk,
            seq_len=s,
        ),
        grid=grid_q,
        in_specs=[q_spec, k_spec, k_spec, br_spec, br_spec, validq_spec,
                  stat_spec, stat_spec, q_spec, stat_spec],
        out_specs=[q_spec, br_spec, br_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, s, d), q.dtype),
            jax.ShapeDtypeStruct((kb.shape[0], bh, s, d), q.dtype),
            jax.ShapeDtypeStruct((kb.shape[0], bh, s, d), q.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((tq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT
        ),
        interpret=interpret,
    )(q, k0, v0, kb, vb, key_valid, m_b, l_b, do, delta_b)

    # dk/dv: grid with q innermost; q-aligned tensors re-indexed by the inner
    # grid axis
    qi_spec = pl.BlockSpec((1, tq, d), lambda b, jk, iq: (b, iq, 0),
                           memory_space=pltpu.VMEM)
    ki_spec = pl.BlockSpec((1, tk, d), lambda b, jk, iq: (b, jk, 0),
                           memory_space=pltpu.VMEM)
    stat_i_spec = pl.BlockSpec((1, 8, tq), lambda b, jk, iq: (b, 0, iq),
                               memory_space=pltpu.VMEM)
    valid_i_spec = pl.BlockSpec((1, 1, tk), lambda b, jk, iq: (b, 0, jk),
                                memory_space=pltpu.VMEM)
    grid_k = (bh, pl.cdiv(s, tk), pl.cdiv(s, tq))
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, tq=tq, tk=tk, seq_len=s,
        ),
        grid=grid_k,
        in_specs=[qi_spec, ki_spec, ki_spec, valid_i_spec, stat_i_spec,
                  stat_i_spec, qi_spec, stat_i_spec],
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
    )(q, k0, v0, key_valid, m_b, l_b, do, delta_b)
    return dq, dk, dv, dkb[:nb], dvb[:nb]


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------

def _normalize_branches(q, branches):
    bh, s, d = q.shape
    if branches:
        kb = jnp.stack([b[0] for b in branches])
        vb = jnp.stack([b[1] for b in branches])
    else:
        kb = jnp.zeros((1, bh, s, d), q.dtype)
        vb = jnp.zeros((1, bh, s, d), q.dtype)
    return kb, vb


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def ttt_flash_attention_flat(q, k0, v0, branches, key_valid, tq, tk,
                             interpret):
    out, _res = _ttt_flash_fwd(q, k0, v0, branches, key_valid, tq, tk,
                               interpret)
    return out


def _ttt_flash_fwd(q, k0, v0, branches, key_valid, tq, tk, interpret):
    kb, vb = _normalize_branches(q, branches)
    out, m, l = _fwd_pallas(
        q, k0, v0, kb, vb, key_valid[:, None, :], n_branches=len(branches),
        tq=tq, tk=tk, interpret=interpret,
    )
    return out, (q, k0, v0, kb, vb, key_valid, m, l, out, len(branches))


def _ttt_flash_bwd(tq, tk, interpret, residuals, do):
    q, k0, v0, kb, vb, valid, m, l, out, nb = residuals
    dq, dk, dv, dkb, dvb = _bwd_pallas(
        q, k0, v0, kb, vb, valid[:, None, :], m, l, out, do,
        n_branches=nb, tq=tq, tk=tk, interpret=interpret,
    )
    dbranches = tuple((dkb[i], dvb[i]) for i in range(nb))
    return dq, dk, dv, dbranches, None


ttt_flash_attention_flat.defvjp(_ttt_flash_fwd, _ttt_flash_bwd)


# --------------------------------------------------------------------------
# offset-causal flash attention with LSE output (the ring-hop kernel)
# --------------------------------------------------------------------------
#
# One ring hop attends local queries (global rows ``row_off + i``) to a
# rotated K/V chunk (global cols ``col_off + j``) under GLOBAL causality
# ``col <= row`` — which unifies the three hop cases (earlier chunk: all
# allowed; own chunk: locally causal; later chunk: nothing) without a
# per-device static branch. Returns the normalized output AND the row LSE so
# hops (and TTT branch logits) merge in XLA by log-sum-exp — the reference
# ring_flash_attn update_out_and_lse (layers/ring/ring_flash_attn.py:7,
# utils.py:10-51) with the O(S_g^2) fp32 score matrix replaced by this tiled
# kernel (VERDICT W1).


def _lse_fwd_kernel(off_ref, q_ref, k_ref, v_ref, valid_ref,
                    o_ref, lse_ref, m_acc, l_acc, o_acc,
                    *, scale, tq, tk, sk):
    i, j = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)
    row_off, col_off = off_ref[0], off_ref[1]

    @pl.when(j == 0)
    def _init():
        m_acc[...] = jnp.full_like(m_acc, NEG_INF)
        l_acc[...] = jnp.zeros_like(l_acc)
        o_acc[...] = jnp.zeros_like(o_acc)

    # tile-skip under global causality (dynamic offsets)
    @pl.when(j * tk + col_off <= i * tq + tq - 1 + row_off)
    def _attend():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        row, col = _row_ids(tq, tk, i, j)
        allow = (col + col_off <= row + row_off) & (col < sk)
        allow = allow & (valid_ref[0, 0] != 0)[None, :]
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
        m = m_acc[:, 0:1]
        l = l_acc[:, 0:1]
        o_ref[0] = (o_acc[...] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        lse = jnp.where(l > 0.0, m + jnp.log(jnp.maximum(l, 1e-30)), NEG_INF)
        lse_ref[0] = jnp.broadcast_to(lse, (tq, STAT)).astype(jnp.float32)


def _lse_bwd_dq_kernel(off_ref, q_ref, k_ref, v_ref, valid_ref, lse_ref,
                       do_ref, dstat_ref, dq_ref, dq_acc,
                       *, scale, tq, tk, sk):
    i, j = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)
    row_off, col_off = off_ref[0], off_ref[1]

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(j * tk + col_off <= i * tq + tq - 1 + row_off)
    def _attend():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        lse = lse_ref[0][:, 0:1]
        do = do_ref[0].astype(jnp.float32)
        dstat = dstat_ref[0][:, 0:1]  # delta - dlse
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        row, col = _row_ids(tq, tk, i, j)
        allow = (col + col_off <= row + row_off) & (col < sk)
        allow = allow & (valid_ref[0, 0] != 0)[None, :]
        p = jnp.where(allow, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - dstat)
        dq_acc[...] = dq_acc[...] + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _lse_bwd_dkv_kernel(off_ref, q_ref, k_ref, v_ref, valid_ref, lse_ref,
                        do_ref, dstat_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                        *, scale, tq, tk, sk):
    jk, iq = pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(2)
    row_off, col_off = off_ref[0], off_ref[1]

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(iq * tq + tq - 1 + row_off >= jk * tk + col_off)
    def _attend():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        lse = lse_ref[0][:, 0:1]
        do = do_ref[0].astype(jnp.float32)
        dstat = dstat_ref[0][:, 0:1]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        row, col = _row_ids(tq, tk, iq, jk)
        allow = (col + col_off <= row + row_off) & (col < sk)
        allow = allow & (valid_ref[0, 0] != 0)[None, :]
        p = jnp.where(allow, jnp.exp(s - lse), 0.0)
        dv_acc[...] = dv_acc[...] + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - dstat)
        dk_acc[...] = dk_acc[...] + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _lse_specs(tq, tk, d, kb_unused=None):
    q_spec = pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    valid_spec = pl.BlockSpec((1, 1, tk), lambda b, i, j: (b, 0, j),
                              memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, tq, STAT), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM)
    off_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return q_spec, k_spec, valid_spec, stat_spec, off_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention_lse(q, k, v, key_valid, offsets, tq, tk, interpret):
    """Offset-causal flash attention: ``(out [BH,Sq,D], lse [BH,Sq,1])``.

    ``offsets`` is an int32 [2] array (row_offset, col_offset) of GLOBAL
    positions; allowance is ``col + col_off <= row + row_off`` (plus
    ``key_valid``). Rows with no allowed key return out=0, lse=-inf.
    """
    out, lse, _res = _flash_lse_fwd_impl(q, k, v, key_valid, offsets, tq, tk,
                                         interpret)
    return out, lse


def _flash_lse_fwd_impl(q, k, v, key_valid, offsets, tq, tk, interpret):
    bh, sq, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    tq = min(tq, max(sq, 8))
    tk = min(tk, max(sk, 8))
    grid = (bh, pl.cdiv(sq, tq), pl.cdiv(sk, tk))
    q_spec, k_spec, valid_spec, stat_spec, off_spec = _lse_specs(tq, tk, d)
    out, lse = pl.pallas_call(
        functools.partial(_lse_fwd_kernel, scale=scale, tq=tq, tk=tk, sk=sk),
        grid=grid,
        in_specs=[off_spec, q_spec, k_spec, k_spec, valid_spec],
        out_specs=[q_spec, stat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, STAT), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, STAT), jnp.float32),
            pltpu.VMEM((tq, STAT), jnp.float32),
            pltpu.VMEM((tq, d), jnp.float32),
        ],
        interpret=interpret,
    )(offsets, q, k, v, key_valid[:, None, :])
    return out, lse[..., :1], None


def _flash_lse_fwd(q, k, v, key_valid, offsets, tq, tk, interpret):
    out, lse, _ = _flash_lse_fwd_impl(q, k, v, key_valid, offsets, tq, tk,
                                      interpret)
    return (out, lse), (q, k, v, key_valid, offsets, lse, out)


def _flash_lse_bwd(tq, tk, interpret, residuals, grads):
    do, dlse = grads
    q, k, v, key_valid, offsets, lse, out = residuals
    bh, sq, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    tq = min(tq, max(sq, 8))
    tk = min(tk, max(sk, 8))
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    # joint stat: ds = p * (dp - delta + dlse)
    dstat = delta - dlse.astype(jnp.float32)
    lse_b = jnp.broadcast_to(lse, (bh, sq, STAT))
    dstat_b = jnp.broadcast_to(dstat, (bh, sq, STAT))
    valid = key_valid[:, None, :]

    q_spec, k_spec, valid_spec, stat_spec, off_spec = _lse_specs(tq, tk, d)
    grid_q = (bh, pl.cdiv(sq, tq), pl.cdiv(sk, tk))
    dq = pl.pallas_call(
        functools.partial(_lse_bwd_dq_kernel, scale=scale, tq=tq, tk=tk,
                          sk=sk),
        grid=grid_q,
        in_specs=[off_spec, q_spec, k_spec, k_spec, valid_spec, stat_spec,
                  q_spec, stat_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((tq, d), jnp.float32)],
        interpret=interpret,
    )(offsets, q, k, v, valid, lse_b, do, dstat_b)

    qi_spec = pl.BlockSpec((1, tq, d), lambda b, jk, iq: (b, iq, 0),
                           memory_space=pltpu.VMEM)
    ki_spec = pl.BlockSpec((1, tk, d), lambda b, jk, iq: (b, jk, 0),
                           memory_space=pltpu.VMEM)
    stat_i_spec = pl.BlockSpec((1, tq, STAT), lambda b, jk, iq: (b, iq, 0),
                               memory_space=pltpu.VMEM)
    valid_i_spec = pl.BlockSpec((1, 1, tk), lambda b, jk, iq: (b, 0, jk),
                                memory_space=pltpu.VMEM)
    grid_k = (bh, pl.cdiv(sk, tk), pl.cdiv(sq, tq))
    dk, dv = pl.pallas_call(
        functools.partial(_lse_bwd_dkv_kernel, scale=scale, tq=tq, tk=tk,
                          sk=sk),
        grid=grid_k,
        in_specs=[off_spec, qi_spec, ki_spec, ki_spec, valid_i_spec,
                  stat_i_spec, qi_spec, stat_i_spec],
        out_specs=[ki_spec, ki_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, d), jnp.float32),
            pltpu.VMEM((tk, d), jnp.float32),
        ],
        interpret=interpret,
    )(offsets, q, k, v, valid, lse_b, do, dstat_b)
    return dq, dk, dv, None, None


flash_attention_lse.defvjp(_flash_lse_fwd, _flash_lse_bwd)


def ttt_flash_attention(
    q: jnp.ndarray,                # [B, H, S, D]
    keys: List[jnp.ndarray],       # per-branch [B, KVH, S, D]
    values: List[jnp.ndarray],
    key_valid: Optional[jnp.ndarray] = None,  # [B, S]
    tq: Optional[int] = None,
    tk: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """TTT branch flash attention → [B, S, H*D] (dispatch wrapper)."""
    b, h, s, d = q.shape
    tq, tk = _env_tiles(tq, tk, s)
    kvh = keys[0].shape[1]
    g = h // kvh
    # pad the sequence to a tile multiple with EXPLICIT zeros + invalid
    # keys: partial-tile reads past the array are unspecified memory, and
    # a stray inf there turns a whole q tile's online-softmax stats NaN
    pad = (-s) % max(tq, tk)
    sp = s + pad

    def flat(x):
        if x.shape[1] != h:
            x = jnp.repeat(x, g, axis=1)
        x = x.reshape(b * h, s, d)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    qf = flat(q)
    k0, v0 = flat(keys[0]), flat(values[0])
    branches = tuple(
        (flat(k), flat(v)) for k, v in zip(keys[1:], values[1:])
    )
    if key_valid is not None:
        valid = jnp.repeat(
            key_valid.astype(jnp.int32), h, axis=0
        ).reshape(b * h, s)
    else:
        valid = jnp.ones((b * h, s), jnp.int32)
    if pad:
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    out = ttt_flash_attention_flat(qf, k0, v0, branches, valid, tq, tk,
                                   interpret)
    out = out[:, :s]
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3).reshape(b, s, h * d)
