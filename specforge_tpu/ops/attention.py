"""Attention ops for draft-model training.

The distinctive op is the EAGLE3 **TTT branch attention**: at TTT step ``t`` the
query attends (a) fully causally to the step-0 keys/values and (b) to exactly one
key per earlier TTT branch — the key at its *own* position — with all logits
normalized by one joint softmax. Reference semantics:
specforge/modeling/draft/llama3_eagle.py:717-778 (sdpa branch-cache merge) and
the flash LSE-merge autograd at :1024-1152.

Dense XLA implementation here (the reference/fallback path, and fast enough for
S ≲ 2k); the Pallas flash kernel with the same contract lives in
:mod:`specforge_tpu.ops.attention_pallas` and is dispatched by
:func:`ttt_branch_attention`.

GQA is handled by grouped einsums over [B, KVH, G, S, D] — no materialized
``repeat_kv``.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e38  # large-negative additive bias (finite: avoids NaN rows)


def make_causal_bias(
    attention_mask: Optional[jnp.ndarray],
    batch_size: int,
    seq_len: int,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Additive [B, 1, S, S] bias combining causality and key-padding.

    ``attention_mask``: [B, S] with 1 = real token, 0 = padding (or None).
    Matches ``prepare_decoder_attention_mask`` (llama3_eagle.py:190-215).
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    causal = jnp.where(col <= row, 0.0, NEG_INF).astype(dtype)
    bias = jnp.broadcast_to(causal[None, None], (batch_size, 1, seq_len, seq_len))
    if attention_mask is not None:
        key_ok = attention_mask.astype(jnp.bool_)[:, None, None, :]
        bias = jnp.where(key_ok, bias, jnp.asarray(NEG_INF, dtype))
    return bias


def _group_heads(q: jnp.ndarray, num_kv_heads: int) -> jnp.ndarray:
    """[B, H, S, D] → [B, KVH, G, S, D]."""
    b, h, s, d = q.shape
    return q.reshape(b, num_kv_heads, h // num_kv_heads, s, d)


def ttt_branch_attention_reference(
    q: jnp.ndarray,
    keys: List[jnp.ndarray],
    values: List[jnp.ndarray],
    bias: jnp.ndarray,
) -> jnp.ndarray:
    """Dense TTT branch attention.

    Args:
        q: [B, H, S, D] roped queries of the current step.
        keys/values: per-branch [B, KVH, S, D]; branch 0 is the full causal
            block, branches 1..t contribute one diagonal key each. The *last*
            entry is the current step's K/V (matching the reference, which
            appends before attending).
        bias: [B, 1, S, S] additive bias for the causal block.

    Returns:
        [B, S, H*D] attention output in q's dtype.
    """
    b, h, s, d = q.shape
    kvh = keys[0].shape[1]
    g = h // kvh
    scale = 1.0 / (d ** 0.5)
    qg = _group_heads(q, kvh)

    # Causal block: [B, KVH, G, S, S] in fp32.
    w0 = jnp.einsum(
        "bkgsd,bktd->bkgst", qg, keys[0], preferred_element_type=jnp.float32
    ) * scale
    w0 = w0 + bias[:, :, None].astype(jnp.float32)

    extras = []
    for ki in keys[1:]:
        # Diagonal logits: q_s · k_{i,s} → [B, KVH, G, S]
        wi = jnp.einsum(
            "bkgsd,bksd->bkgs", qg, ki, preferred_element_type=jnp.float32
        ) * scale
        extras.append(wi[..., None])
    logits = jnp.concatenate([w0] + extras, axis=-1) if extras else w0

    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgst,bktd->bkgsd", p[..., :s], values[0])
    for i, vi in enumerate(values[1:]):
        out = out + p[..., s + i, None] * vi[:, :, None]
    return out.reshape(b, kvh, g, s, d).reshape(b, h, s, d).transpose(
        0, 2, 1, 3
    ).reshape(b, s, h * d)


def ttt_branch_attention_chunked(
    q: jnp.ndarray,
    keys: List[jnp.ndarray],
    values: List[jnp.ndarray],
    bias: jnp.ndarray,
    q_chunk: int = 256,
) -> jnp.ndarray:
    """Flash-style TTT branch attention: q tiled over chunks under
    ``jax.checkpoint`` so peak score memory is O(q_chunk · S) and the backward
    pass recomputes — the long-sequence path (branch diagonals are q-aligned,
    so each chunk needs only its own branch slice).
    """
    b, h, s, d = q.shape
    kvh = keys[0].shape[1]
    g = h // kvh
    scale = 1.0 / (d ** 0.5)
    if s % q_chunk != 0:
        return ttt_branch_attention_reference(q, keys, values, bias)
    n_chunks = s // q_chunk
    n_br = len(keys) - 1

    k0, v0 = keys[0], values[0]
    # [n_chunks, B, KVH, G, TQ, D]
    q_chunks = jnp.moveaxis(
        q.reshape(b, kvh, g, n_chunks, q_chunk, d), 3, 0
    )
    bias_chunks = jnp.moveaxis(
        bias.reshape(b, 1, n_chunks, q_chunk, s), 2, 0
    )
    if n_br:
        kb = jnp.stack(keys[1:])    # [NB, B, KVH, S, D]
        vb = jnp.stack(values[1:])
        kb_chunks = jnp.moveaxis(
            kb.reshape(n_br, b, kvh, n_chunks, q_chunk, d), 3, 0
        )
        vb_chunks = jnp.moveaxis(
            vb.reshape(n_br, b, kvh, n_chunks, q_chunk, d), 3, 0
        )
    else:
        kb_chunks = jnp.zeros((n_chunks, 0, b, kvh, q_chunk, d), q.dtype)
        vb_chunks = kb_chunks

    @jax.checkpoint
    def chunk_fn(qc, bias_c, kb_c, vb_c):
        w = jnp.einsum(
            "bkgsd,bktd->bkgst", qc, k0, preferred_element_type=jnp.float32
        ) * scale
        w = w + bias_c[:, :, None].astype(jnp.float32)
        extras = []
        for i in range(n_br):
            wi = jnp.einsum(
                "bkgsd,bksd->bkgs", qc, kb_c[i],
                preferred_element_type=jnp.float32,
            ) * scale
            extras.append(wi[..., None])
        logits = jnp.concatenate([w] + extras, axis=-1) if extras else w
        p = jax.nn.softmax(logits, axis=-1).astype(qc.dtype)
        out = jnp.einsum("bkgst,bktd->bkgsd", p[..., :s], v0)
        for i in range(n_br):
            out = out + p[..., s + i, None] * vb_c[i][:, :, None]
        return out

    def body(_, xs):
        return None, chunk_fn(*xs)

    _, outs = jax.lax.scan(
        body, None, (q_chunks, bias_chunks, kb_chunks, vb_chunks)
    )
    # [n_chunks, B, KVH, G, TQ, D] → [B, S, H*D]
    out = jnp.moveaxis(outs, 0, 3).reshape(b, kvh, g, s, d)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3).reshape(b, s, h * d)


# sequences at or above this length route to the chunked (flash-style) path
CHUNKED_ATTENTION_MIN_SEQ = 1024


def ttt_branch_attention(
    q: jnp.ndarray,
    keys: List[jnp.ndarray],
    values: List[jnp.ndarray],
    bias: jnp.ndarray,
) -> jnp.ndarray:
    """Dense for short sequences; q-chunked flash-style above the threshold."""
    s = q.shape[2]
    if s >= CHUNKED_ATTENTION_MIN_SEQ and s % 256 == 0:
        return ttt_branch_attention_chunked(q, keys, values, bias)
    return ttt_branch_attention_reference(q, keys, values, bias)


def dflash_attention(
    q: jnp.ndarray,
    k_ctx: jnp.ndarray,
    v_ctx: jnp.ndarray,
    k_drf: jnp.ndarray,
    v_drf: jnp.ndarray,
    anchor_positions: jnp.ndarray,
    block_keep_mask: jnp.ndarray,
    block_size: int,
    chunk_blocks: int = 8,
    sliding_window: Optional[int] = None,
) -> jnp.ndarray:
    """DFlash block attention, chunked over anchor blocks.

    Each draft query block (at anchor a) attends to context keys < a (optionally
    sliding-window-bounded) plus its own block's draft keys — the predicate of
    the reference flex-attention ``dflash_mask_mod``
    (dflash_family_model.py:91-133). Instead of a [Q, S+Q] dense mask /
    block-sparse kernel, anchor blocks are processed in chunks under
    ``jax.checkpoint``: per chunk the keys are (full context ‖ own draft
    chunk), so memory is O(chunk · (S + chunk)) and the backward pass
    recomputes scores.

    Args:
        q, k_drf, v_drf: [B, H|KVH, N*block, D] draft-token projections (roped).
        k_ctx, v_ctx:    [B, KVH, S, D] context projections (roped).
        anchor_positions/block_keep_mask: [B, N].

    Returns: [B, N*block, H*D].
    """
    from specforge_tpu.ops.masks import dflash_chunk_mask

    b, h, q_len, d = q.shape
    kvh = k_ctx.shape[1]
    g = h // kvh
    n = anchor_positions.shape[1]
    cg = min(chunk_blocks, n) if chunk_blocks > 0 else n
    if n % cg != 0:
        raise ValueError(f"chunk_blocks {cg} must divide num anchors {n}")
    n_chunks = n // cg
    scale = 1.0 / (d ** 0.5)
    s = k_ctx.shape[2]

    def split_chunks(x):  # [B, heads, N*bs, D] -> [n_chunks, B, heads, cg*bs, D]
        xb = x.reshape(b, x.shape[1], n_chunks, cg * block_size, d)
        return jnp.moveaxis(xb, 2, 0)

    q_chunks = split_chunks(q)
    kd_chunks = split_chunks(k_drf)
    vd_chunks = split_chunks(v_drf)
    anchor_chunks = jnp.moveaxis(
        anchor_positions.reshape(b, n_chunks, cg), 1, 0
    )
    keep_chunks = jnp.moveaxis(
        block_keep_mask.reshape(b, n_chunks, cg), 1, 0
    )

    @jax.checkpoint
    def chunk_attn(qc, kdc, vdc, anchors_c, keep_c):
        allow = dflash_chunk_mask(
            anchors_c, keep_c, s, block_size, sliding_window
        )  # [B, cq, S+cq]
        k_all = jnp.concatenate([k_ctx, kdc], axis=2)
        v_all = jnp.concatenate([v_ctx, vdc], axis=2)
        qg = qc.reshape(b, kvh, g, cg * block_size, d)
        w = jnp.einsum(
            "bkgsd,bktd->bkgst", qg, k_all, preferred_element_type=jnp.float32
        ) * scale
        w = jnp.where(allow[:, None, None], w, NEG_INF)
        p = jax.nn.softmax(w, axis=-1).astype(qc.dtype)
        out = jnp.einsum("bkgst,bktd->bkgsd", p, v_all)
        keep_q = jnp.repeat(keep_c, block_size, axis=1)
        out = out * keep_q[:, None, None, :, None].astype(out.dtype)
        return out.reshape(b, h, cg * block_size, d)

    def body(_, xs):
        return None, chunk_attn(*xs)

    _, outs = jax.lax.scan(
        body, None, (q_chunks, kd_chunks, vd_chunks, anchor_chunks, keep_chunks)
    )
    # [n_chunks, B, H, cq, D] -> [B, N*bs, H*D]
    out = jnp.moveaxis(outs, 0, 2).reshape(b, h, q_len, d)
    return out.transpose(0, 2, 1, 3).reshape(b, q_len, h * d)


def masked_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Plain dense attention with an additive bias (DFlash-family building block).

    q: [B, H, S, D], k/v: [B, KVH, T, D], bias: broadcastable to [B, 1|H, S, T].
    Returns [B, S, H*D].
    """
    b, h, s, d = q.shape
    kvh = k.shape[1]
    g = h // kvh
    scale = 1.0 / (d ** 0.5)
    qg = _group_heads(q, kvh)
    w = jnp.einsum(
        "bkgsd,bktd->bkgst", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        if bias.ndim == 4 and bias.shape[1] == 1:
            w = w + bias[:, :, None].astype(jnp.float32)
        else:
            w = w + bias.reshape(b, kvh, g, *bias.shape[-2:]).astype(jnp.float32)
    p = jax.nn.softmax(w, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgst,bktd->bkgsd", p, v)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3).reshape(b, s, h * d)
