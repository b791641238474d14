"""Teacher projection for EAGLE-family training.

Given the frozen target model's full-vocab logits (or its last hidden state plus
the frozen ``lm_head`` weight), produce the quantities the TTT loop consumes:

- ``target_p``          — teacher distribution renormalized over the draft vocab
                          (softmax of the t2d-gathered logits), the CE target.
- ``accept_ratio``      — per-position scalar ``exp(lse_draft - lse_full)``:
                          the un-renormalized draft-vocab probabilities are
                          exactly ``target_p * accept_ratio``, so the
                          [B, S, V_draft] fp32 ``target_p_on_draft`` tensor of
                          the reference never persists — the acceptance metric
                          reconstructs its per-step slice transiently. At
                          Qwen3-8B scale this saves 500MB of live HBM per
                          training step.
- ``target_token_ids``  — full-vocab argmax token ids.
- ``position_mask``     — ``t2d[argmax] * loss_mask``: supervise only positions
                          whose teacher-argmax token exists in the draft vocab.

Reference semantics: specforge/algorithms/eagle3/model.py:445-501 (full-vocab
path) and specforge/core/compact_teacher.py (hidden-state path). The compact
path here is written so XLA can stream the vocab dimension: the full-vocab
logsumexp/argmax runs as a ``lax.scan`` over vocab chunks of the head matmul —
the [B, S, V] fp32 logits tensor is never materialized.

The t2d/d2t vocab maps follow the reference convention:
- ``t2d``: bool [vocab]            — membership of each target token in the draft vocab.
- ``d2t``: int  [draft_vocab]      — offset such that target_index = draft_index + d2t[draft_index].
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

DEFAULT_VOCAB_CHUNK_SIZE = 32768


def draft_gather_indices(d2t: jnp.ndarray) -> jnp.ndarray:
    """Target-vocab gather indices for each draft-vocab slot: ``i + d2t[i]``."""
    v_draft = d2t.shape[0]
    return jnp.arange(v_draft, dtype=d2t.dtype) + d2t


def compute_target_p(
    target_logits: jnp.ndarray,
    t2d: jnp.ndarray,
    d2t: jnp.ndarray,
    loss_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-vocab teacher projection.

    Args:
        target_logits: [B, S, V] target logits (any float dtype; upcast to f32).
        t2d: bool [V].
        d2t: int [V_draft].
        loss_mask: [B, S, 1] int/float mask of supervised positions.

    Returns:
        target_p [B, S, V_draft] f32, accept_ratio [B, S, 1] f32
        (``p_on_draft == target_p * accept_ratio`` exactly),
        target_token_ids [B, S] int32, position_mask [B, S, 1].
    """
    t = target_logits.astype(jnp.float32)
    target_token_ids = jnp.argmax(t, axis=-1).astype(jnp.int32)
    gather_idx = draft_gather_indices(d2t)
    draft_logits = jnp.take(t, gather_idx, axis=-1)
    target_p = jax.nn.softmax(draft_logits, axis=-1)
    lse_draft = jax.nn.logsumexp(draft_logits, axis=-1, keepdims=True)
    lse_full = jax.nn.logsumexp(t, axis=-1, keepdims=True)
    accept_ratio = jnp.exp(lse_draft - lse_full)
    in_draft = jnp.take(t2d, target_token_ids)[..., None].astype(jnp.int32)
    position_mask = in_draft * loss_mask.astype(jnp.int32)
    return target_p, accept_ratio, target_token_ids, position_mask


def _pad_teacher(
    target_p: jnp.ndarray,
    accept_ratio: jnp.ndarray,
    target_token_ids: jnp.ndarray,
    length: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pad teacher tensors by ``length`` along the sequence axis.

    Pad values replicate the reference exactly (eagle3/model.py:459-477):
    target_p pads with the uniform 1/V_draft distribution (bitwise-equality
    legacy), the acceptance ratio with 0 (p_on_draft pads with 0), token ids
    with 0.
    """
    v_draft = target_p.shape[-1]
    target_p_padded = jnp.pad(
        target_p,
        ((0, 0), (0, length), (0, 0)),
        constant_values=1.0 / v_draft,
    )
    accept_ratio_padded = jnp.pad(
        accept_ratio, ((0, 0), (0, length), (0, 0)), constant_values=0.0
    )
    target_token_ids_padded = jnp.pad(
        target_token_ids, ((0, 0), (0, length)), constant_values=0
    )
    return target_p_padded, accept_ratio_padded, target_token_ids_padded


def compute_target_p_padded(
    target_logits: jnp.ndarray,
    t2d: jnp.ndarray,
    d2t: jnp.ndarray,
    loss_mask: jnp.ndarray,
    length: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-vocab teacher projection padded by the TTT length."""
    target_p, accept_ratio, token_ids, position_mask = compute_target_p(
        target_logits, t2d, d2t, loss_mask
    )
    padded = _pad_teacher(target_p, accept_ratio, token_ids, length)
    return (*padded, position_mask)


@partial(jax.jit, static_argnames=("chunk_size",))
def tiled_logsumexp_argmax(
    hidden: jnp.ndarray,
    weight: jnp.ndarray,
    chunk_size: int = DEFAULT_VOCAB_CHUNK_SIZE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-vocab fp32 logsumexp [..., 1] and argmax [...] without [..., V] logits.

    Streams the head matmul over vocab chunks as an UNROLLED loop (chunk
    count is tiny — vocab/32k ≈ 5); ties resolve to the lowest index
    (reference: core/compact_teacher.py:57-110). Unrolling instead of
    ``lax.scan`` lets XLA fuse each chunk's matmul with its reductions and
    drop the carry packing — measured on v5e at the EAGLE3 bench shape
    (1536×4096 @ 4096×151936): 23.3 ms scan → 19.4 ms unrolled (pure
    matmul floor 12.6 ms; a fused Pallas kernel was measured SLOWER at
    21.4 ms because MXU matmul and VPU reductions serialize per tile).
    Live fp32 logits stay bounded to one [rows, chunk] block.
    """
    vocab_size, h = weight.shape
    lead_shape = hidden.shape[:-1]
    hidden2d = hidden.reshape(-1, h)
    n_rows = hidden2d.shape[0]
    n_chunks = -(-vocab_size // chunk_size)

    neg_inf = jnp.float32(-jnp.inf)
    run_max = jnp.full((n_rows,), neg_inf, jnp.float32)
    run_sumexp = jnp.zeros((n_rows,), jnp.float32)
    run_argval = jnp.full((n_rows,), neg_inf, jnp.float32)
    run_argmax = jnp.zeros((n_rows,), jnp.int32)

    for c in range(n_chunks):
        lo = c * chunk_size
        hi = min(lo + chunk_size, vocab_size)
        w_chunk = jax.lax.slice_in_dim(weight, lo, hi, axis=0)
        logits = jnp.dot(
            hidden2d, w_chunk.T, preferred_element_type=jnp.float32
        ).astype(jnp.float32)

        chunk_max = jnp.max(logits, axis=-1)
        new_max = jnp.maximum(run_max, chunk_max)
        run_sumexp = run_sumexp * jnp.exp(run_max - new_max) + jnp.sum(
            jnp.exp(logits - new_max[:, None]), axis=-1
        )
        run_max = new_max

        chunk_idx = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        chunk_val = jnp.take_along_axis(logits, chunk_idx[:, None], axis=-1)[:, 0]
        take = chunk_val > run_argval  # strict > keeps the lowest global index
        run_argmax = jnp.where(take, chunk_idx + lo, run_argmax)
        run_argval = jnp.where(take, chunk_val, run_argval)

    log_z = run_max + jnp.log(run_sumexp)
    return log_z.reshape(*lead_shape, 1), run_argmax.reshape(lead_shape)


def compute_target_p_from_hidden(
    hidden: jnp.ndarray,
    lm_head_weight: jnp.ndarray,
    t2d: jnp.ndarray,
    d2t: jnp.ndarray,
    loss_mask: jnp.ndarray,
    chunk_size: int = DEFAULT_VOCAB_CHUNK_SIZE,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compact teacher: reproduce :func:`compute_target_p` from last hidden states.

    ``hidden`` [B, S, H], ``lm_head_weight`` [V, H]. The draft-vocab logits come
    from a t2d-gathered head slice (an MXU matmul over [V_draft, H]); the
    full-vocab logsumexp/argmax stream over vocab chunks.
    Reference: core/compact_teacher.py:113-210.
    """
    gather_idx = draft_gather_indices(d2t)
    draft_head = jnp.take(lm_head_weight, gather_idx, axis=0)
    draft_logits = jnp.einsum(
        "bsh,vh->bsv", hidden, draft_head, preferred_element_type=jnp.float32
    ).astype(jnp.float32)
    log_z, target_token_ids = tiled_logsumexp_argmax(
        hidden, lm_head_weight, chunk_size=chunk_size
    )
    target_token_ids = target_token_ids.astype(jnp.int32)
    target_p = jax.nn.softmax(draft_logits, axis=-1)
    lse_draft = jax.nn.logsumexp(draft_logits, axis=-1, keepdims=True)
    accept_ratio = jnp.exp(lse_draft - log_z)
    in_draft = jnp.take(t2d, target_token_ids)[..., None].astype(jnp.int32)
    position_mask = in_draft * loss_mask.astype(jnp.int32)
    return target_p, accept_ratio, target_token_ids, position_mask


def compute_target_p_padded_from_hidden(
    hidden: jnp.ndarray,
    lm_head_weight: jnp.ndarray,
    t2d: jnp.ndarray,
    d2t: jnp.ndarray,
    loss_mask: jnp.ndarray,
    length: int,
    chunk_size: int = DEFAULT_VOCAB_CHUNK_SIZE,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compact teacher with the +length TTT padding applied."""
    target_p, accept_ratio, token_ids, position_mask = (
        compute_target_p_from_hidden(
            hidden, lm_head_weight, t2d, d2t, loss_mask, chunk_size=chunk_size
        )
    )
    padded = _pad_teacher(target_p, accept_ratio, token_ids, length)
    return (*padded, position_mask)
