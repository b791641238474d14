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
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked-mean acceptance and log-acceptance over valid positions.

    ``target_probs`` is the *un-renormalized* teacher restricted to the draft
    vocab (``target_p_on_draft``); draft probabilities come from a full softmax
    of the draft logits in fp32.
    """
    draft_p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
        target_probs.dtype
    )
    acc_per_token = expected_acceptance_rate(target_probs, draft_p)
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
