"""Pallas TPU flash attention for the P-EAGLE COD (chain-of-draft) mask.

The COD predicate (reference peagle_mask_mod; XLA builder
``specforge_tpu.algorithms.peagle.model.peagle_allow_mask``): query token q
(anchor a_q, depth d_q, doc doc_q, valid v_q) may attend key token k iff

    doc_q != -1  and  doc_q == doc_k  and  v_q and v_k and
    ( (d_k == 0 and a_q >= a_k)                 # depth-0 trunk, causal
      or (a_q == a_k and d_q >= d_k) )          # own rollout, depth-ordered

The dense path materializes [B, KVH, G, T, T] fp32 scores plus bf16
probability residuals per layer (~750MB + ~370MB per layer at the s=768
reference shape, and O(T^2) growth makes s=2048 impossible on one chip);
here the predicate is computed inside the kernel from the four per-token
vectors — the flex-attention "mask_mod" made native (SURVEY §2.9 #5, the
P-EAGLE half) — with fully-masked K tiles skipped via a precomputed
[B, NQ, NK] any() table in SMEM.

Rows with no allowed key (invalid/padding slots) return 0 — the dense path
returns a uniform average there instead, but those rows are excluded from
the loss and never attended by valid rows (the mask conjoins valid on both
sides), so loss and gradients are unchanged.

Layouts (GQA pre-expanded to full heads by the wrapper):
    q, k, v                      [BH, T, D]
    anchor/depth/doc/valid       [BH, 1, T] int32 (read twice: q rows by the
                                 i grid axis, key cols by the j axis)
    tile_any                     [BH, NQ, NK] int32 in SMEM

T is padded to a tile multiple with valid=0 slots (zero K/V, fully masked).
Forward saves per-row (m, l); backward recomputes probabilities tile-by-tile
(dq; then dk/dv with q innermost) — the flash backward split shared with
:mod:`specforge_tpu.ops.dflash_pallas`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
STAT = 8        # stat lane width (block lane dim == array dim is legal)
STAT_ACC = 128  # VMEM-only accumulator lanes
DEF_TQ = 512
DEF_TK = 512


def _cod_allow(qa, qd, qdoc, qv, ka, kd, kdoc, kv):
    """[tq, tk] COD allowance from q-row / k-col property vectors."""
    trunk = (kd[None, :] == 0) & (qa[:, None] >= ka[None, :])
    rollout = (qa[:, None] == ka[None, :]) & (qd[:, None] >= kd[None, :])
    return (
        (qdoc[:, None] != -1)
        & (qdoc[:, None] == kdoc[None, :])
        & (trunk | rollout)
        & (qv[:, None] != 0)
        & (kv[None, :] != 0)
    )


def cod_allow_dense(ap, dp, dc, vl):
    """[T, T] XLA mirror of the in-kernel predicate (``dc`` is the doc id of
    each token's anchor, -1 = padding; ``vl`` int). Matches
    ``algorithms.peagle.model.peagle_allow_mask`` with the anchor→doc
    indirection already applied."""
    trunk = (dp[None, :] == 0) & (ap[:, None] >= ap[None, :])
    rollout = (ap[:, None] == ap[None, :]) & (dp[:, None] >= dp[None, :])
    return (
        (dc[:, None] != -1) & (dc[:, None] == dc[None, :]) & (trunk | rollout)
        & (vl[:, None] > 0) & (vl[None, :] > 0)
    )


def _read_props(aq_ref, dq_ref, cq_ref, vq_ref):
    return aq_ref[0, 0], dq_ref[0, 0], cq_ref[0, 0], vq_ref[0, 0]


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(any_ref, q_ref, k_ref, v_ref,
                qa_ref, qd_ref, qc_ref, qv_ref,
                ka_ref, kd_ref, kc_ref, kv_ref,
                o_ref, m_ref, l_ref,
                m_acc, l_acc, o_acc,
                *, scale, tq, tk):
    bh, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_acc[...] = jnp.full_like(m_acc, NEG_INF)
        l_acc[...] = jnp.zeros_like(l_acc)
        o_acc[...] = jnp.zeros_like(o_acc)

    @pl.when(any_ref[bh, i, j] != 0)
    def _attend():
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        allow = _cod_allow(
            *_read_props(qa_ref, qd_ref, qc_ref, qv_ref),
            *_read_props(ka_ref, kd_ref, kc_ref, kv_ref),
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
        m = m_acc[:, 0:1]
        l = l_acc[:, 0:1]
        o_ref[0] = (o_acc[...] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        m_ref[0] = jnp.broadcast_to(m, (tq, STAT)).astype(jnp.float32)
        l_ref[0] = jnp.broadcast_to(l, (tq, STAT)).astype(jnp.float32)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------

def _bwd_dq_kernel(any_ref, q_ref, k_ref, v_ref,
                   qa_ref, qd_ref, qc_ref, qv_ref,
                   ka_ref, kd_ref, kc_ref, kv_ref,
                   m_ref, l_ref, do_ref, delta_ref,
                   dq_ref, dq_acc,
                   *, scale, tq, tk):
    bh, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(any_ref[bh, i, j] != 0)
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
        allow = _cod_allow(
            *_read_props(qa_ref, qd_ref, qc_ref, qv_ref),
            *_read_props(ka_ref, kd_ref, kc_ref, kv_ref),
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
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(any_ref, q_ref, k_ref, v_ref,
                    qa_ref, qd_ref, qc_ref, qv_ref,
                    ka_ref, kd_ref, kc_ref, kv_ref,
                    m_ref, l_ref, do_ref, delta_ref,
                    dk_ref2, dv_ref, dk_acc, dv_acc,
                    *, scale, tq, tk):
    # grid: (bh, k_tile, q_tile) — q innermost accumulates
    bh, jk, iq = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(any_ref[bh, iq, jk] != 0)
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
        allow = _cod_allow(
            *_read_props(qa_ref, qd_ref, qc_ref, qv_ref),
            *_read_props(ka_ref, kd_ref, kc_ref, kv_ref),
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
        dk_ref2[0] = dk_acc[...].astype(dk_ref2.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


# --------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# --------------------------------------------------------------------------

def _specs(tq, tk, d):
    q_spec = pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0),
                          memory_space=pltpu.VMEM)
    rowq_spec = pl.BlockSpec((1, 1, tq), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM)
    rowk_spec = pl.BlockSpec((1, 1, tk), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, tq, STAT), lambda b, i, j: (b, i, 0),
                             memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return q_spec, k_spec, rowq_spec, rowk_spec, stat_spec, smem_spec


def _fwd_pallas(q, k, v, props, tile_any, *, tq, tk, interpret):
    bh, t, d = q.shape
    scale = 1.0 / (d ** 0.5)
    grid = (bh, t // tq, t // tk)
    q_spec, k_spec, rowq_spec, rowk_spec, stat_spec, smem_spec = _specs(
        tq, tk, d
    )
    out, m, l = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, tq=tq, tk=tk),
        grid=grid,
        in_specs=[smem_spec, q_spec, k_spec, k_spec,
                  rowq_spec, rowq_spec, rowq_spec, rowq_spec,
                  rowk_spec, rowk_spec, rowk_spec, rowk_spec],
        out_specs=[q_spec, stat_spec, stat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t, STAT), jnp.float32),
            jax.ShapeDtypeStruct((bh, t, STAT), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, STAT_ACC), jnp.float32),
            pltpu.VMEM((tq, STAT_ACC), jnp.float32),
            pltpu.VMEM((tq, d), jnp.float32),
        ],
        interpret=interpret,
    )(tile_any, q, k, v, *props, *props)
    return out, m[..., :1], l[..., :1]


def _bwd_pallas(q, k, v, props, tile_any, m, l, out, do, *, tq, tk,
                interpret):
    bh, t, d = q.shape
    scale = 1.0 / (d ** 0.5)
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1,
        keepdims=True,
    )
    m_b = jnp.broadcast_to(m, (bh, t, STAT))
    l_b = jnp.broadcast_to(l, (bh, t, STAT))
    delta_b = jnp.broadcast_to(delta, (bh, t, STAT))
    q_spec, k_spec, rowq_spec, rowk_spec, stat_spec, smem_spec = _specs(
        tq, tk, d
    )

    grid_q = (bh, t // tq, t // tk)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, tq=tq, tk=tk),
        grid=grid_q,
        in_specs=[smem_spec, q_spec, k_spec, k_spec,
                  rowq_spec, rowq_spec, rowq_spec, rowq_spec,
                  rowk_spec, rowk_spec, rowk_spec, rowk_spec,
                  stat_spec, stat_spec, q_spec, stat_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((tq, d), jnp.float32)],
        interpret=interpret,
    )(tile_any, q, k, v, *props, *props, m_b, l_b, do, delta_b)

    qi_spec = pl.BlockSpec((1, tq, d), lambda b, jk, iq: (b, iq, 0),
                           memory_space=pltpu.VMEM)
    ki_spec = pl.BlockSpec((1, tk, d), lambda b, jk, iq: (b, jk, 0),
                           memory_space=pltpu.VMEM)
    rowqi_spec = pl.BlockSpec((1, 1, tq), lambda b, jk, iq: (b, 0, iq),
                              memory_space=pltpu.VMEM)
    rowki_spec = pl.BlockSpec((1, 1, tk), lambda b, jk, iq: (b, 0, jk),
                              memory_space=pltpu.VMEM)
    stati_spec = pl.BlockSpec((1, tq, STAT), lambda b, jk, iq: (b, iq, 0),
                              memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    grid_k = (bh, t // tk, t // tq)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, tq=tq, tk=tk),
        grid=grid_k,
        in_specs=[smem_spec, qi_spec, ki_spec, ki_spec,
                  rowqi_spec, rowqi_spec, rowqi_spec, rowqi_spec,
                  rowki_spec, rowki_spec, rowki_spec, rowki_spec,
                  stati_spec, stati_spec, qi_spec, stati_spec],
        out_specs=[ki_spec, ki_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, d), jnp.float32),
            pltpu.VMEM((tk, d), jnp.float32),
        ],
        interpret=interpret,
    )(tile_any, q, k, v, *props, *props, m_b, l_b, do, delta_b)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _cod_flash_flat(q, k, v, props, tile_any, tq, tk, interpret):
    out, _, _ = _fwd_pallas(q, k, v, props, tile_any, tq=tq, tk=tk,
                            interpret=interpret)
    return out


def _flat_fwd(q, k, v, props, tile_any, tq, tk, interpret):
    out, m, l = _fwd_pallas(q, k, v, props, tile_any, tq=tq, tk=tk,
                            interpret=interpret)
    return out, (q, k, v, props, tile_any, m, l, out)


def _flat_bwd(tq, tk, interpret, res, do):
    q, k, v, props, tile_any, m, l, out = res
    dq, dk, dv = _bwd_pallas(q, k, v, props, tile_any, m, l, out, do,
                             tq=tq, tk=tk, interpret=interpret)
    return dq, dk, dv, None, None


_cod_flash_flat.defvjp(_flat_fwd, _flat_bwd)


def cod_flash_attention(
    q: jnp.ndarray,            # [B, H, T, D]
    k: jnp.ndarray,            # [B, KVH, T, D]
    v: jnp.ndarray,
    anchor_pos: jnp.ndarray,   # [B, T] int32
    depth: jnp.ndarray,        # [B, T] int32
    doc: jnp.ndarray,          # [B, T] int32 (doc id of the anchor, -1 = pad)
    valid: jnp.ndarray,        # [B, T] bool
    tq: int = DEF_TQ,
    tk: int = DEF_TK,
    interpret: bool = False,
    allow_mask: jnp.ndarray = None,  # optional precomputed [B, T, T] bool
) -> jnp.ndarray:
    """P-EAGLE COD flash attention → [B, T, H*D].

    T is zero-padded to a tile multiple internally (padding slots carry
    valid=0 and are fully masked); fully-masked rows return 0. Pass the
    model's precomputed ``allow_mask`` to derive the tile-skip table from
    it instead of rebuilding the predicate."""
    b, h, t, d = q.shape
    kvh = k.shape[1]
    g = h // kvh
    # clamp tiles to T, rounded up to a sublane multiple of 8 (Mosaic
    # alignment; t_pad pads the data to match)
    rup8 = lambda x: -(-x // 8) * 8
    tq = rup8(min(tq, max(t, 8)))
    tk = rup8(min(tk, max(t, 8)))
    lcm = tq * tk // math.gcd(tq, tk)
    t_pad = -(-t // lcm) * lcm

    def flat(x):
        if x.shape[1] != h:
            x = jnp.repeat(x, g, axis=1)
        x = x.reshape(b * h, t, d)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    qf, kf, vf = flat(q), flat(k), flat(v)

    def prop(x, fill):
        x = x.astype(jnp.int32)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t)), constant_values=fill)
        return jnp.repeat(x, h, axis=0).reshape(b * h, 1, t_pad)

    props = (
        prop(anchor_pos, 0),
        prop(depth, 0),
        prop(doc, -1),
        prop(valid, 0),
    )

    # tile-skip table (tiny: [B, NQ, NK]). Preferred source: the [T, T]
    # allow mask the model already built once for all layers (so the O(T^2)
    # predicate build is not repeated per layer even without CSE); fallback
    # rebuilds it from the prop vectors. Padding rows/cols are all-False.
    nq_t, nk_t = t_pad // tq, t_pad // tk
    if allow_mask is not None:
        allow_p = allow_mask
        if t_pad != t:
            allow_p = jnp.pad(
                allow_mask, ((0, 0), (0, t_pad - t), (0, t_pad - t))
            )
        tile_any = jnp.any(
            allow_p.reshape(b, nq_t, tq, nk_t, tk), axis=(2, 4)
        ).astype(jnp.int32)
    else:
        def one_any(ap, dp, dc, vl):
            allow = cod_allow_dense(ap, dp, dc, vl)
            return jnp.any(
                allow.reshape(nq_t, tq, nk_t, tk), axis=(1, 3)
            ).astype(jnp.int32)

        pa = anchor_pos.astype(jnp.int32)
        pd = depth.astype(jnp.int32)
        pc = doc.astype(jnp.int32)
        pv = valid.astype(jnp.int32)
        if t_pad != t:
            pad1 = ((0, 0), (0, t_pad - t))
            pa = jnp.pad(pa, pad1)
            pd = jnp.pad(pd, pad1)
            pc = jnp.pad(pc, pad1, constant_values=-1)
            pv = jnp.pad(pv, pad1)
        tile_any = jax.vmap(one_any)(pa, pd, pc, pv)  # [B, NQ, NK]
    tile_any = jnp.repeat(tile_any, h, axis=0)

    out = _cod_flash_flat(qf, kf, vf, props, tile_any, tq, tk, interpret)
    out = out[:, :t].reshape(b, h, t, d)
    return out.transpose(0, 2, 1, 3).reshape(b, t, h * d)
