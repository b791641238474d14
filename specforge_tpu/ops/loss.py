"""Fused draft-vocab cross-entropy against a dense teacher distribution.

``loss = -mean_over_rows( position_mask * sum_v target_p * log_softmax(logits) )``

where the mean is over **all** B*T rows (masked rows contribute 0 but still count
in the denominator) — reference semantics: specforge/core/loss.py:15-21 and the
Triton kernels at :49-228.

Two implementations:

- :func:`log_softmax_loss_reference` — plain XLA, used on CPU and as the parity
  oracle for the Pallas kernel.
- :func:`log_softmax_loss` — dispatcher with a custom VJP. On TPU it calls the
  Pallas kernel in :mod:`specforge_tpu.ops.loss_pallas`, which streams vocab
  tiles with an online logsumexp so the fp32 log-probabilities tensor is never
  materialized in HBM; elsewhere it falls back to the XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def log_softmax_loss_reference(
    logits: jnp.ndarray, target_p: jnp.ndarray, position_mask: jnp.ndarray
) -> jnp.ndarray:
    """[B, T, V] logits × [B, T, V] teacher × [B, T, 1] mask → scalar f32 loss."""
    logits = logits.astype(jnp.float32)
    out_logp = jax.nn.log_softmax(logits, axis=2)
    plogp = target_p.astype(jnp.float32) * out_logp
    return -jnp.sum(position_mask.astype(jnp.float32) * plogp, axis=2).mean()


def _use_pallas() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing should not fail
        return False


@jax.custom_vjp
def log_softmax_loss(
    logits: jnp.ndarray, target_p: jnp.ndarray, position_mask: jnp.ndarray
) -> jnp.ndarray:
    """Fused CE loss; differentiable in ``logits`` only (teacher is detached)."""
    loss, _ = _loss_fwd_impl(logits, target_p, position_mask)
    return loss


def _loss_fwd_impl(logits, target_p, position_mask):
    if _use_pallas():
        from specforge_tpu.ops.loss_pallas import loss_forward_pallas

        loss, residuals = loss_forward_pallas(logits, target_p, position_mask)
        return loss, residuals
    # XLA fallback: save (m, d, ts) row statistics so fwd/bwd match the kernel.
    f32 = logits.astype(jnp.float32)
    m = jnp.max(f32, axis=-1, keepdims=True)
    d = jnp.sum(jnp.exp(f32 - m), axis=-1, keepdims=True)
    t32 = target_p.astype(jnp.float32)
    ts = jnp.sum(t32, axis=-1, keepdims=True)
    s1 = jnp.sum(t32 * f32, axis=-1, keepdims=True)
    mask = (position_mask != 0).astype(jnp.float32)
    row_loss = -(s1 - ts * (m + jnp.log(d))) * mask
    loss = jnp.mean(row_loss)
    return loss, (m, d, ts, mask)


def _loss_bwd_impl(logits, target_p, residuals, g):
    if _use_pallas():
        from specforge_tpu.ops.loss_pallas import loss_backward_pallas

        return loss_backward_pallas(logits, target_p, residuals, g)
    m, d, ts, mask = residuals
    b, t, v = logits.shape
    scale = g.astype(jnp.float32) / (b * t)
    f32 = logits.astype(jnp.float32)
    softmax = jnp.exp(f32 - m) / d
    grad = -(target_p.astype(jnp.float32) * scale - softmax * (ts * scale))
    grad = grad * mask
    return grad.astype(logits.dtype)


def _loss_vjp_fwd(logits, target_p, position_mask):
    loss, residuals = _loss_fwd_impl(logits, target_p, position_mask)
    return loss, (logits, target_p, residuals)


def _loss_vjp_bwd(saved, g):
    logits, target_p, residuals = saved
    grad_logits = _loss_bwd_impl(logits, target_p, residuals, g)
    return grad_logits, None, None


log_softmax_loss.defvjp(_loss_vjp_fwd, _loss_vjp_bwd)
