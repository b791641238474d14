"""DFlash-family masking + anchor sampling.

Semantics mirror specforge/algorithms/common/dflash_family_model.py:36-133:

- Anchors are supervised positions whose clean token *and* first target token
  are supervised; a fixed number are sampled per batch row with keyed RNG
  (static shapes: the anchor count is always ``num_anchors``; ``keep_mask``
  disables rows with fewer valid candidates).
- The DFlash attention mask lets draft query block b (at anchor a_b) see
  (i) context keys strictly before a_b (optionally sliding-window-bounded) and
  (ii) its own block's draft keys (optionally intra-block causal under
  sliding window).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sample_anchor_positions(
    rng: jax.Array,
    loss_mask: jnp.ndarray,
    num_anchors: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``num_anchors`` anchors per row from positions where both
    ``loss_mask[s]`` and ``loss_mask[s+1]`` are set.

    Args:
        rng: PRNG key (fold in the step index for determinism across
            topologies — the parity-gate contract).
        loss_mask: [B, S] (or [B, S, 1]).

    Returns:
        (anchor_positions [B, N] int32 sorted ascending with invalid slots 0,
         keep_mask [B, N] bool).
    """
    if loss_mask.ndim == 3:
        loss_mask = loss_mask[..., 0]
    b, s = loss_mask.shape
    num_candidates = max(s - 1, 0)
    valid = (loss_mask[:, :num_candidates] > 0.5) & (
        loss_mask[:, 1 : num_candidates + 1] > 0.5
    )
    valid_counts = jnp.sum(valid, axis=1)

    random_values = jax.random.uniform(rng, valid.shape)
    random_values = jnp.where(valid, random_values, 2.0)
    order = jnp.argsort(random_values, axis=1)[:, :num_anchors].astype(jnp.int32)
    keep_mask = (
        jnp.arange(num_anchors, dtype=jnp.int32)[None, :]
        < jnp.minimum(valid_counts, num_anchors)[:, None]
    )
    sentinel = jnp.int32(num_candidates)
    anchors = jnp.where(keep_mask, order, sentinel)
    anchors = jnp.sort(anchors, axis=1)
    keep_mask = anchors < sentinel
    return jnp.where(keep_mask, anchors, 0), keep_mask


def dflash_dense_mask(
    anchor_positions: jnp.ndarray,
    block_keep_mask: jnp.ndarray,
    seq_len: int,
    block_size: int,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """Dense boolean allow-mask [B, 1, N*block, S + N*block].

    Reference ``create_dflash_sdpa_mask`` — used as the test oracle and for
    small shapes; the chunked attention path computes the same predicate
    per anchor chunk without materializing this tensor.
    """
    b, n = anchor_positions.shape
    q_len = n * block_size
    kv_len = seq_len + q_len

    q_idx = jnp.arange(q_len, dtype=jnp.int32).reshape(1, 1, q_len, 1)
    kv_idx = jnp.arange(kv_len, dtype=jnp.int32).reshape(1, 1, 1, kv_len)
    q_block = q_idx // block_size
    q_off = q_idx % block_size

    anchor_exp = jnp.repeat(
        anchor_positions.reshape(b, 1, n, 1), block_size, axis=2
    )

    mask_context = (kv_idx < seq_len) & (kv_idx < anchor_exp)
    if sliding_window is not None:
        lower = anchor_exp + q_off - (sliding_window - 1)
        mask_context = mask_context & (kv_idx >= lower)

    is_draft = kv_idx >= seq_len
    kv_block = (kv_idx - seq_len) // block_size
    mask_draft = is_draft & (q_block == kv_block)
    if sliding_window is not None:
        kv_off = (kv_idx - seq_len) % block_size
        mask_draft = mask_draft & (kv_off <= q_off)

    valid_block = jnp.repeat(
        block_keep_mask.reshape(b, 1, n, 1), block_size, axis=2
    )
    return (mask_context | mask_draft) & valid_block


def dflash_chunk_mask(
    anchor_chunk: jnp.ndarray,
    keep_chunk: jnp.ndarray,
    seq_len: int,
    block_size: int,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """Allow-mask for one anchor chunk: [B, cg*block, S + cg*block].

    Key layout per chunk: full context [0, S) then the chunk's own draft keys.
    """
    b, cg = anchor_chunk.shape
    q_len = cg * block_size

    q_off = jnp.tile(jnp.arange(block_size, dtype=jnp.int32), cg)  # [q_len]
    anchor_q = jnp.repeat(anchor_chunk, block_size, axis=1)  # [B, q_len]
    keep_q = jnp.repeat(keep_chunk, block_size, axis=1)

    ctx_idx = jnp.arange(seq_len, dtype=jnp.int32)
    mask_context = ctx_idx[None, None, :] < anchor_q[:, :, None]
    if sliding_window is not None:
        lower = anchor_q[:, :, None] + q_off[None, :, None] - (sliding_window - 1)
        mask_context = mask_context & (ctx_idx[None, None, :] >= lower)

    q_block = jnp.repeat(jnp.arange(cg, dtype=jnp.int32), block_size)
    kv_block = q_block
    same_block = q_block[:, None] == kv_block[None, :]  # [q_len, q_len]
    if sliding_window is not None:
        kv_off = q_off
        same_block = same_block & (kv_off[None, :] <= q_off[:, None])
    mask_draft = jnp.broadcast_to(same_block[None], (b, q_len, q_len))

    allow = jnp.concatenate([mask_context, mask_draft], axis=-1)
    return allow & keep_q[:, :, None]
