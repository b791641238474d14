"""USP sequence parallelism: Ulysses (head-scatter all-to-all) × Ring attention,
composed with the EAGLE3 TTT branch-cache merge.

TPU-native replacement for the reference USP stack (yunchang SeqAllToAll4D +
in-repo ring flash attention + ``_USPRingFlashCachedMergeFunc``,
specforge/layers/ring/*, llama3_eagle.py:1154-1504):

- **Ulysses**: ``lax.all_to_all`` over the ``sp_ulysses`` axis scatters heads
  and gathers sequence, so each device attends full-resolution sequence chunks
  with a head subset.
- **Ring**: the branch-0 (causal) K/V chunks rotate around the ``sp_ring``
  axis via ``lax.ppermute``; partial attention per hop merges through the
  online-softmax (m, l, o) statistics with contiguous-chunk causal gating
  (hop from a later chunk contributes nothing; own chunk is locally causal).
- **TTT branches**: branch K/V are position-diagonal, so after the Ulysses
  exchange they are *local* — one extra logit per branch folds into the same
  (m, l, o) merge, no ring traffic.

Everything runs inside ``shard_map`` and is reverse-differentiable (ppermute
and all_to_all have transpose rules); per-hop attention runs under
``jax.checkpoint`` so the backward pass recomputes scores.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def ulysses_scatter_heads(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """[B, H, S_loc, D] → [B, H/u, S_loc*u, D] (heads scatter, seq gather)."""
    return jax.lax.all_to_all(
        x, axis_name, split_axis=1, concat_axis=2, tiled=True
    )


def ulysses_gather_heads(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Inverse of :func:`ulysses_scatter_heads`."""
    return jax.lax.all_to_all(
        x, axis_name, split_axis=2, concat_axis=1, tiled=True
    )


def _chunk_attn_update(q, k, v, allow, m, l, o, scale):
    """One online-softmax partial update against a K/V chunk."""
    w = jnp.einsum(
        "bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32
    ) * scale
    w = jnp.where(allow, w, NEG_INF)
    chunk_max = jnp.max(w, axis=-1, keepdims=True)  # [B,H,S,1]
    m_new = jnp.maximum(m, chunk_max)
    p = jnp.exp(w - m_new)
    correction = jnp.exp(m - m_new)
    l_new = l * correction + jnp.sum(p, axis=-1, keepdims=True)
    o_new = o * correction + jnp.einsum(
        "bhst,bhtd->bhsd", p, v.astype(jnp.float32)
    )
    return m_new, l_new, o_new


def _ring_ttt_attention_pallas(
    q, k0, v0, branch_keys, branch_values, key_valid, axis_name,
    interpret,
):
    """Pallas-tiled ring hops: each hop runs the offset-causal flash kernel
    (O(tile) memory, no [S_g, S_g] fp32 score matrix — VERDICT W1) and
    returns (out, lse); hops + TTT branch logits merge by log-sum-exp in XLA
    (the reference update_out_and_lse, layers/ring/utils.py:10-51)."""
    from specforge_tpu.ops.attention_pallas import flash_attention_lse

    b, h, s_g, d = q.shape
    ring_size = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    row_off = my * s_g
    qf = q.reshape(b * h, s_g, d)
    perm = [(i, (i + 1) % ring_size) for i in range(ring_size)]

    def flat_valid(vld):
        if vld is None:
            return jnp.ones((b * h, s_g), jnp.int32)
        return jnp.repeat(vld.astype(jnp.int32), h, axis=0).reshape(
            b * h, s_g
        )

    outs, lses = [], []
    k_cur, v_cur, valid_cur = k0, v0, key_valid
    for hop in range(ring_size):
        src = (my - hop) % ring_size
        offsets = jnp.stack(
            [row_off, src * s_g]
        ).astype(jnp.int32)
        out_h, lse_h = flash_attention_lse(
            qf, k_cur.reshape(b * h, s_g, d), v_cur.reshape(b * h, s_g, d),
            flat_valid(valid_cur), offsets, 256, 256, interpret,
        )
        outs.append(out_h.reshape(b, h, s_g, d).astype(jnp.float32))
        lses.append(lse_h.reshape(b, h, s_g, 1))
        if hop != ring_size - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            if valid_cur is not None:
                valid_cur = jax.lax.ppermute(valid_cur, axis_name, perm)

    # branch diagonal logits fold as single-key attention sources
    q32 = q.astype(jnp.float32)
    scale = 1.0 / (d ** 0.5)
    for ki, vi in zip(branch_keys, branch_values):
        wi = jnp.sum(
            q32 * ki.astype(jnp.float32), axis=-1, keepdims=True
        ) * scale
        lses.append(wi)
        outs.append(jnp.broadcast_to(vi.astype(jnp.float32), q.shape))

    m = jnp.max(jnp.concatenate(lses, axis=-1), axis=-1, keepdims=True)
    m = jnp.maximum(m, NEG_INF)  # all-masked rows stay finite-ish
    numer = sum(o * jnp.exp(l - m) for o, l in zip(outs, lses))
    denom = sum(jnp.exp(l - m) for l in lses)
    return (numer / jnp.maximum(denom, 1e-30)).astype(q.dtype)


def ring_ttt_attention(
    q: jnp.ndarray,                 # [B, Hl, S_g, D] (post-ulysses)
    k0: jnp.ndarray,                # branch-0 keys, same shape
    v0: jnp.ndarray,
    branch_keys: List[jnp.ndarray],   # each [B, Hl, S_g, D], diagonal branches
    branch_values: List[jnp.ndarray],
    key_valid: Optional[jnp.ndarray],  # [B, S_g] validity of local k chunk
    axis_name: str,
    impl: str = "dense",
    interpret: bool = False,
) -> jnp.ndarray:
    """Ring flash attention over the causal block + local TTT branch merge.

    Chunk layout is contiguous: ring rank r owns global positions
    ``[r*S_g, (r+1)*S_g)``. Returns [B, Hl, S_g, D] in q's dtype.
    ``impl='pallas'`` uses the tiled offset-causal kernel per hop.
    """
    if impl == "pallas":
        return _ring_ttt_attention_pallas(
            q, k0, v0, branch_keys, branch_values, key_valid, axis_name,
            interpret,
        )
    b, h, s_g, d = q.shape
    scale = 1.0 / (d ** 0.5)
    ring_size = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)

    q32 = q.astype(jnp.float32)
    m = jnp.full((b, h, s_g, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, s_g, 1), jnp.float32)
    o = jnp.zeros((b, h, s_g, d), jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (s_g, s_g), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s_g, s_g), 1)
    local_causal = col <= row

    k_cur, v_cur, valid_cur = k0, v0, key_valid
    perm = [(i, (i + 1) % ring_size) for i in range(ring_size)]

    update = jax.checkpoint(_chunk_attn_update)
    for hop in range(ring_size):
        src = (my - hop) % ring_size  # ring owner of the chunk we hold
        # contiguous chunk-causal gating
        allow_full = src < my
        allow_self = src == my
        allow = jnp.where(
            allow_self,
            local_causal[None, None],
            jnp.broadcast_to(
                allow_full, (1, 1, s_g, s_g)
            ),
        )
        if valid_cur is not None:
            allow = allow & valid_cur.astype(bool)[:, None, None, :]
        m, l, o = update(
            q32, k_cur.astype(jnp.float32), v_cur.astype(jnp.float32),
            allow, m, l, o, scale,
        )
        if hop != ring_size - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            if valid_cur is not None:
                valid_cur = jax.lax.ppermute(valid_cur, axis_name, perm)

    # TTT branches: one diagonal logit per branch (fully local)
    for ki, vi in zip(branch_keys, branch_values):
        wi = jnp.sum(q32 * ki.astype(jnp.float32), axis=-1, keepdims=True) * scale
        m_new = jnp.maximum(m, wi)
        correction = jnp.exp(m - m_new)
        p = jnp.exp(wi - m_new)
        l = l * correction + p
        o = o * correction + p * vi.astype(jnp.float32)
        m = m_new

    out = o / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def usp_ttt_attention_local(
    q: jnp.ndarray,                    # [B, H, S_loc, D] full heads, local seq
    keys: List[jnp.ndarray],           # per-branch [B, KVH(replicated to H?), S_loc, D]
    values: List[jnp.ndarray],
    key_valid: Optional[jnp.ndarray],  # [B, S_loc]
    ulysses_axis: str,
    ring_axis: str,
    impl: str = "dense",
    interpret: bool = False,
) -> jnp.ndarray:
    """Full USP TTT attention for one device's shard (call inside shard_map).

    Heads must already be GQA-expanded to the full head count (the Ulysses
    exchange divides heads across devices, so KV heads must be divisible the
    same way — the reference expands via repeat_kv before SeqAllToAll4D too).
    Returns [B, S_loc, H*D].
    """
    b, h, s_loc, d = q.shape
    qg = ulysses_scatter_heads(q, ulysses_axis)
    keys_g = [ulysses_scatter_heads(k, ulysses_axis) for k in keys]
    values_g = [ulysses_scatter_heads(v, ulysses_axis) for v in values]
    valid_g = None
    if key_valid is not None:
        u = jax.lax.axis_size(ulysses_axis)
        # validity is per-position: gather the sequence without head scatter
        valid_g = jax.lax.all_gather(
            key_valid, ulysses_axis, axis=1, tiled=True
        )

    out = ring_ttt_attention(
        qg, keys_g[0], values_g[0], keys_g[1:], values_g[1:], valid_g,
        ring_axis, impl=impl, interpret=interpret,
    )
    out = ulysses_gather_heads(out, ulysses_axis)  # [B, H, S_loc, D]
    return out.transpose(0, 2, 1, 3).reshape(b, s_loc, h * d)


def usp_ttt_attention(
    mesh: Mesh,
    q: jnp.ndarray,                  # [B, H, S_global, D]
    keys: List[jnp.ndarray],
    values: List[jnp.ndarray],
    key_valid: Optional[jnp.ndarray] = None,   # [B, S_global]
    ulysses_axis: str = "sp_ulysses",
    ring_axis: str = "sp_ring",
    impl: Optional[str] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Global-view entry point: shard_maps the local kernel over the sp axes.

    The sequence axis is sharded over (ring, ulysses) — ring is the *outer*
    chunking (contiguous global chunks per ring rank), ulysses the inner.
    Returns the global [B, S_global, H*D]. ``impl`` defaults to the Pallas
    tiled ring hop on TPU, dense elsewhere (override via
    SPECFORGE_USP_HOP=dense|pallas).
    """
    if impl is None:
        impl = os.environ.get("SPECFORGE_USP_HOP")
    on_tpu = jax.default_backend() not in ("cpu",)
    if impl is None:
        impl = "pallas" if on_tpu else "dense"
    if interpret is None:
        interpret = not on_tpu
    shard_map = jax.shard_map

    n_branches = len(keys)
    seq_spec = P(None, None, (ring_axis, ulysses_axis), None)
    valid_spec = P(None, (ring_axis, ulysses_axis))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            seq_spec,
            tuple(seq_spec for _ in range(n_branches)),
            tuple(seq_spec for _ in range(n_branches)),
            valid_spec if key_valid is not None else P(),
        ),
        out_specs=P(None, (ring_axis, ulysses_axis), None),
        check_vma=False,
    )
    def run(q_l, keys_l, values_l, valid_l):
        return usp_ttt_attention_local(
            q_l, list(keys_l), list(values_l),
            valid_l if key_valid is not None else None,
            ulysses_axis, ring_axis, impl=impl, interpret=interpret,
        )

    return run(
        q, tuple(keys), tuple(values),
        key_valid if key_valid is not None else jnp.zeros((), jnp.int32),
    )
