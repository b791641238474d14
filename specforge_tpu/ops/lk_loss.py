"""Expected-acceptance (LK) objectives for speculative decoding.

``expected acceptance = sum_v min(p_target_v, p_draft_v)`` per token; the LK
loss modes blend it with the KL (CE) loss. Reference semantics:
specforge/core/lk_loss.py:7-99.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def expected_acceptance_rate(
    target_probs: jnp.ndarray, draft_probs: jnp.ndarray
) -> jnp.ndarray:
    """Token-wise expected acceptance: sum over vocab of min(p, q). [B, S]."""
    if target_probs.shape != draft_probs.shape:
        raise ValueError(
            "target_probs and draft_probs must have the same shape, got "
            f"{target_probs.shape} and {draft_probs.shape}"
        )
    return jnp.sum(jnp.minimum(target_probs, draft_probs), axis=-1)


ACCEPTANCE_CHUNK = 8192


def _acceptance_per_token(
    logits: jnp.ndarray, target_probs: jnp.ndarray,
    ratio: Optional[jnp.ndarray] = None,
    chunk: int = ACCEPTANCE_CHUNK,
) -> jnp.ndarray:
    """sum_v min(softmax(logits)_v, q_v) per token, streamed over vocab chunks
    so no [B, S, V] fp32 temporary persists (1GB-class at 32k draft vocab).

    ``ratio`` [B, S, 1]: optional factored teacher scale — the effective
    teacher is ``target_probs * ratio``, multiplied chunk-wise so the product
    is never materialized.
    """
    v = logits.shape[-1]
    if v <= chunk:
        draft_p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        q = target_probs.astype(jnp.float32)
        if ratio is not None:
            q = q * ratio.astype(jnp.float32)
        return expected_acceptance_rate(q, draft_p)

    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1, keepdims=True)
    pad = (-v) % chunk
    logits_p = jnp.pad(logits, ((0, 0),) * (logits.ndim - 1) + ((0, pad),),
                       constant_values=-jnp.inf)
    probs_p = jnp.pad(
        target_probs, ((0, 0),) * (logits.ndim - 1) + ((0, pad),)
    )
    n_chunks = (v + pad) // chunk
    lead = logits.shape[:-1]
    ratio32 = None if ratio is None else ratio.astype(jnp.float32)

    total = jnp.zeros(lead, jnp.float32)
    for c in range(n_chunks):
        lc = jax.lax.dynamic_slice_in_dim(logits_p, c * chunk, chunk, axis=-1)
        qc = jax.lax.dynamic_slice_in_dim(probs_p, c * chunk, chunk, axis=-1)
        draft_p = jnp.exp(lc.astype(jnp.float32) - lse)
        q32 = qc.astype(jnp.float32)
        if ratio32 is not None:
            q32 = q32 * ratio32
        total = total + jnp.sum(jnp.minimum(draft_p, q32), axis=-1)
    return total


def _masked_mean(
    values_per_token: jnp.ndarray,
    position_mask: jnp.ndarray,
    eps: float,
    reduce_axes: Optional[tuple] = None,
) -> jnp.ndarray:
    """Masked mean with optional cross-device psum of numerator/denominator.

    ``reduce_axes``: mesh axis names to psum over (the SP group in USP runs);
    None means local-only.
    """
    mask = position_mask.squeeze(-1).astype(values_per_token.dtype)
    numerator = jnp.sum(values_per_token * mask)
    denominator = jnp.maximum(jnp.sum(mask), eps)
    if reduce_axes:
        numerator = jax.lax.psum(numerator, reduce_axes)
        denominator = jnp.maximum(jax.lax.psum(denominator, reduce_axes), eps)
    return numerator / denominator


def compute_acceptance_rate(
    logits: jnp.ndarray,
    target_probs: jnp.ndarray,
    position_mask: jnp.ndarray,
    eps: float = 1e-8,
    reduce_axes: Optional[tuple] = None,
    ratio: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked-mean acceptance and log-acceptance over valid positions.

    The un-renormalized teacher restricted to the draft vocab is
    ``target_probs`` (optionally factored as ``target_probs * ratio``); draft
    probabilities come from a full softmax of the draft logits in fp32.
    """
    acc_per_token = _acceptance_per_token(logits, target_probs, ratio)
    acceptance_rate = _masked_mean(acc_per_token, position_mask, eps, reduce_axes)
    log_acc_per_token = jnp.where(acc_per_token > 0, jnp.log(acc_per_token), 0.0)
    log_acceptance_rate = _masked_mean(
        log_acc_per_token, position_mask, eps, reduce_axes
    )
    return acceptance_rate, log_acceptance_rate


def compute_lk_loss(
    kl_loss: jnp.ndarray,
    acceptance_rate: jnp.ndarray,
    log_acceptance_rate: jnp.ndarray,
    lk_loss_type: str,
    kl_scale: float,
    kl_decay: float,
) -> jnp.ndarray:
    """LK objective: ``alpha`` = -E[log a]; ``lambda`` = adaptive KL/(1-a) blend."""
    if lk_loss_type == "alpha":
        return -log_acceptance_rate
    if lk_loss_type == "lambda":
        acc_det = jax.lax.stop_gradient(acceptance_rate)
        kl_weight = kl_scale * jnp.exp(-kl_decay * acc_det)
        return kl_weight * kl_loss + (1 - kl_weight) * (1 - acceptance_rate)
    raise ValueError(f"Unknown lk loss type: {lk_loss_type}")
