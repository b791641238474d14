"""Pallas TPU kernels for the fused draft-vocab CE loss.

TPU-native replacement for the reference Triton kernels
(specforge/core/loss.py:49-170). Layout differs deliberately from the
row-per-program Triton design: rows are tiled in sublane-aligned blocks and the
vocab axis is streamed in lane tiles via the sequential Pallas grid, with the
per-row online statistics (running max ``m``, running sumexp ``d``, teacher
mass ``ts``, weighted logit sum ``s1``) held in VMEM scratch across vocab
steps. One pass suffices because

    row_loss = -( sum_v t_v x_v  -  (sum_v t_v) * (m + log d) ).

The backward kernel is a pure elementwise map over the same tiling:

    grad = -(t * g - softmax(x) * ts * g) * mask,   g = dL * 1/(B*T).

Per-row statistics are kept in (ROW_TILE, STAT_LANES) buffers broadcast across
all 128 lanes — the layout the reference JAX flash-attention kernels use to
keep VPU reads/writes dense.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 256
VOCAB_TILE = 2048
STAT_LANES = 128

NEG_INF = -1e30  # finite stand-in for -inf: avoids inf-inf NaNs in exp diffs


def _bcast(col: jnp.ndarray) -> jnp.ndarray:
    """(R, 1) → (R, STAT_LANES) broadcast for dense stat-buffer writes."""
    return jnp.broadcast_to(col, (col.shape[0], STAT_LANES))


def _fwd_kernel(logits_ref, target_ref, mask_ref, loss_ref, m_ref, d_ref, ts_ref,
                m_acc, d_acc, ts_acc, s1_acc, *, n_vocab: int, vocab_tile: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_acc[...] = jnp.full_like(m_acc, NEG_INF)
        d_acc[...] = jnp.zeros_like(d_acc)
        ts_acc[...] = jnp.zeros_like(ts_acc)
        s1_acc[...] = jnp.zeros_like(s1_acc)

    x = logits_ref[...].astype(jnp.float32)
    t = target_ref[...].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    valid = (j * vocab_tile + lane) < n_vocab
    x_masked = jnp.where(valid, x, NEG_INF)
    t = jnp.where(valid, t, 0.0)

    m_old = m_acc[:, 0:1]
    block_max = jnp.max(x_masked, axis=1, keepdims=True)
    m_new = jnp.maximum(m_old, block_max)
    exp_x = jnp.where(valid, jnp.exp(x_masked - m_new), 0.0)
    m_acc[...] = _bcast(m_new)
    d_acc[...] = _bcast(
        d_acc[:, 0:1] * jnp.exp(m_old - m_new)
        + jnp.sum(exp_x, axis=1, keepdims=True)
    )
    ts_acc[...] = _bcast(ts_acc[:, 0:1] + jnp.sum(t, axis=1, keepdims=True))
    s1_acc[...] = _bcast(
        s1_acc[:, 0:1] + jnp.sum(t * jnp.where(valid, x, 0.0), axis=1, keepdims=True)
    )

    @pl.when(j == nj - 1)
    def _finalize():
        m = m_acc[:, 0:1]
        d = d_acc[:, 0:1]
        ts = ts_acc[:, 0:1]
        s1 = s1_acc[:, 0:1]
        mask = (mask_ref[...][:, 0:1] != 0).astype(jnp.float32)
        loss_ref[...] = -(s1 - ts * (m + jnp.log(d))) * mask
        m_ref[...] = m
        d_ref[...] = d
        ts_ref[...] = ts


def loss_forward_pallas(
    logits: jnp.ndarray, target_p: jnp.ndarray, position_mask: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, Tuple]:
    b, t, v = logits.shape
    rows = b * t
    logits2 = logits.reshape(rows, v)
    target2 = target_p.reshape(rows, v)
    mask2 = position_mask.reshape(rows, 1).astype(jnp.int32)

    grid = (pl.cdiv(rows, ROW_TILE), pl.cdiv(v, VOCAB_TILE))
    kernel = functools.partial(_fwd_kernel, n_vocab=v, vocab_tile=VOCAB_TILE)
    row_spec = pl.BlockSpec((ROW_TILE, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, 1), jnp.float32)
    stat = functools.partial(pltpu.VMEM, (ROW_TILE, STAT_LANES), jnp.float32)
    row_loss, m, d, ts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, VOCAB_TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, VOCAB_TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            row_spec,
        ],
        out_specs=[row_spec, row_spec, row_spec, row_spec],
        out_shape=[out_shape, out_shape, out_shape, out_shape],
        scratch_shapes=[stat(), stat(), stat(), stat()],
        interpret=interpret,
    )(logits2, target2, mask2)
    loss = jnp.sum(row_loss) / rows
    return loss, (m, d, ts, mask2)


def _bwd_kernel(logits_ref, target_ref, m_ref, d_ref, ts_ref, mask_ref, g_ref,
                grad_ref, *, n_vocab: int, vocab_tile: int, inv_rows: float):
    j = pl.program_id(1)
    x = logits_ref[...].astype(jnp.float32)
    t = target_ref[...].astype(jnp.float32)
    g = g_ref[0] * inv_rows
    m = m_ref[...][:, 0:1]
    d = d_ref[...][:, 0:1]
    ts = ts_ref[...][:, 0:1]
    mask = (mask_ref[...][:, 0:1] != 0).astype(jnp.float32)
    softmax = jnp.exp(x - m) / d
    grad = -(t * g - softmax * (ts * g)) * mask
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    valid = (j * vocab_tile + lane) < n_vocab
    grad_ref[...] = jnp.where(valid, grad, 0.0).astype(grad_ref.dtype)


def loss_backward_pallas(
    logits: jnp.ndarray, target_p: jnp.ndarray, residuals: Tuple, g: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    m, d, ts, mask2 = residuals
    b, t, v = logits.shape
    rows = b * t
    logits2 = logits.reshape(rows, v)
    target2 = target_p.reshape(rows, v)
    g1 = jnp.asarray(g, jnp.float32).reshape(1)

    grid = (pl.cdiv(rows, ROW_TILE), pl.cdiv(v, VOCAB_TILE))
    kernel = functools.partial(
        _bwd_kernel, n_vocab=v, vocab_tile=VOCAB_TILE, inv_rows=1.0 / rows
    )
    row_spec = pl.BlockSpec((ROW_TILE, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    grad2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROW_TILE, VOCAB_TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, VOCAB_TILE), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            row_spec,
            row_spec,
            row_spec,
            row_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, VOCAB_TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, v), logits.dtype),
        interpret=interpret,
    )(logits2, target2, m, d, ts, mask2.astype(jnp.int32), g1)
    return grad2.reshape(b, t, v)
