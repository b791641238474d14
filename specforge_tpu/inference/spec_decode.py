"""Speculative decoding with a trained EAGLE3 draft — the serving-side loop.

TPU-native equivalent of the reference's serving benchmark path (SGLang +
bench_eagle3.py accept-length measurement): a greedy chain speculative decoder
with KV-cached target and draft forwards, used to measure *real* accept
lengths for a trained draft without an external serving stack.

Correctness invariant (tested): greedy speculative decoding emits exactly the
target model's greedy sequence, for any draft — the draft only changes the
accept length, never the output.

Static-shape design: caches are fixed [L, B, KVH, max_len, D] buffers with a
``cache_len`` scalar; every jitted function has fixed block shapes, so the
data-dependent accept loop runs in Python over compiled steps (batch 1, the
reference constraint for its accept-length harness).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, replace
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from specforge_tpu.models.target.transformer import (
    TargetConfig,
    _act,
    _rms,
)
from specforge_tpu.ops.rope import RopeSpec, apply_rope, rope_cos_sin


# --------------------------------------------------------------------------
# cached target forward
# --------------------------------------------------------------------------

@dataclass
class TargetState:
    cache_k: jnp.ndarray   # [L, B, KVH, M, D]
    cache_v: jnp.ndarray
    length: int            # python int: tokens already in cache


def init_target_state(config: TargetConfig, batch: int, max_len: int,
                      dtype=jnp.bfloat16) -> TargetState:
    shape = (
        config.num_hidden_layers, batch, config.num_key_value_heads, max_len,
        config.resolved_head_dim,
    )
    return TargetState(
        cache_k=jnp.zeros(shape, dtype), cache_v=jnp.zeros(shape, dtype),
        length=0,
    )


def _scatter_cache_rows(cache, new, starts):
    """Per-row cache write: ``cache[b, :, starts[b] + j] = new[b, :, j]``
    for cache [B, KVH, M, D], new [B, KVH, T, D], starts [B] — the batched
    counterpart of ``dynamic_update_slice`` when rows sit at DIFFERENT
    lengths (per-row accept counts diverge after the first round)."""
    b = cache.shape[0]
    t = new.shape[2]
    slots = starts[:, None] + jnp.arange(t, dtype=jnp.int32)     # [B, T]
    return cache.at[jnp.arange(b)[:, None], :, slots].set(
        new.transpose(0, 2, 1, 3).astype(cache.dtype), mode="drop"
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "capture_layers"),
)
def target_cached_forward(
    params: Dict[str, jnp.ndarray],
    config: TargetConfig,
    input_ids: jnp.ndarray,     # [B, T] block
    cache_k: jnp.ndarray,
    cache_v: jnp.ndarray,
    cache_len: jnp.ndarray,     # scalar int32, or [B] per-row lengths
    capture_layers: Tuple[int, ...],
    block_allow: Optional[jnp.ndarray] = None,   # [T, T] bool tree mask
    block_positions: Optional[jnp.ndarray] = None,  # [T] logical depths
    prefix_valid: Optional[jnp.ndarray] = None,  # [B, M] bool pad mask
):
    """Decode/prefill one block against the cache.

    ``block_allow``/``block_positions`` enable TREE verification: the block
    holds tree nodes in slot order; node i attends the full prefix plus the
    block slots ``block_allow[i]`` (its ancestors), and its RoPE position is
    ``cache_len + block_positions[i]`` (its depth) rather than its slot
    index. Default (None) is plain causal decode.

    Batched serving: ``cache_len`` may be a [B] vector (rows at different
    lengths — K/V land via per-row scatter) and ``prefix_valid`` masks
    left-pad slots out of attention. RoPE scores depend only on position
    DIFFERENCES, so a left-padded row computes exactly its unpadded result.

    Returns (logits [B, T, V], aux [B, T, L*H], new_cache_k, new_cache_v).
    """
    cfg = config
    b, t = input_ids.shape
    d = cfg.resolved_head_dim
    h, kvh = cfg.num_attention_heads, cfg.num_key_value_heads
    g = h // kvh
    m = cache_k.shape[3]
    rope_spec = RopeSpec.from_config(cfg)
    capture_set = set(int(c) for c in capture_layers)
    cache_len = jnp.asarray(cache_len, jnp.int32)
    per_row = cache_len.ndim == 1
    len_col = cache_len[:, None] if per_row else cache_len  # [B,1] | scalar

    depths = (
        jnp.arange(t, dtype=jnp.int32) if block_positions is None
        else block_positions.astype(jnp.int32)
    )
    positions = len_col + depths[None]
    positions = jnp.broadcast_to(positions, (b, t))
    cos, sin = rope_cos_sin(rope_spec, positions, m, dtype=jnp.bfloat16)

    x = jnp.take(params["model.embed_tokens.weight"], input_ids, axis=0)
    col = jnp.arange(m, dtype=jnp.int32)[None, :]
    if block_allow is None:
        # causal: col slot < cache_len + row + 1; [T, M] (scalar len) or
        # [B, T, M] (per-row)
        row_pos = jnp.arange(t, dtype=jnp.int32)[:, None]
        if per_row:
            allow = col[None] <= cache_len[:, None, None] + row_pos[None]
        else:
            allow = col <= cache_len + row_pos
    elif per_row:
        # tree with PER-ROW cache lengths (batched tree/beam serving):
        # row b's block occupies slots cache_len[b] .. cache_len[b]+t-1,
        # so the ancestor mask is looked up at a per-row slot offset
        prefix_vis = col < cache_len[:, None]             # [B, M]
        in_block = (col >= cache_len[:, None]) & (
            col < cache_len[:, None] + t
        )
        bidx = jnp.clip(col - cache_len[:, None], 0, t - 1)  # [B, M]
        if block_allow.ndim == 3:
            # per-row tree shapes (batched beam): block_allow [B, T, T]
            blk_vis = jnp.take_along_axis(
                block_allow, bidx[:, None, :], axis=2
            )                                             # [B, T, M]
        else:
            blk_vis = jnp.take(block_allow, bidx, axis=1)  # [T, B, M]
            blk_vis = blk_vis.transpose(1, 0, 2)           # [B, T, M]
        allow = prefix_vis[:, None, :] | (in_block[:, None, :] & blk_vis)
    else:
        # tree: full prefix + ancestor slots within the block
        prefix_vis = col < cache_len                      # [1, M]
        in_block = (col >= cache_len) & (col < cache_len + t)
        bidx = jnp.clip(col[0] - cache_len, 0, t - 1)     # [M]
        blk_vis = jnp.take(block_allow, bidx, axis=1)     # [T, M]
        allow = prefix_vis | (in_block & blk_vis)
    if prefix_valid is not None:
        # [B, M] pad mask joins on the batch axis
        if allow.ndim == 2:
            allow = allow[None] & prefix_valid[:, None, :]
        else:
            allow = allow & prefix_valid[:, None, :]

    captured = {}
    for i in range(cfg.num_hidden_layers):
        prefix = f"model.layers.{i}"
        residual = x
        y = _rms(x, params[f"{prefix}.input_layernorm.weight"],
                 cfg.rms_norm_eps)

        def proj(name, val):
            w = params[f"{prefix}.self_attn.{name}.weight"]
            out = val @ w.T
            bk = f"{prefix}.self_attn.{name}.bias"
            if bk in params:
                out = out + params[bk]
            return out

        q = proj("q_proj", y).reshape(b, t, h, d)
        k = proj("k_proj", y).reshape(b, t, kvh, d)
        v = proj("v_proj", y).reshape(b, t, kvh, d)
        if cfg.qk_norm:
            q = _rms(q, params[f"{prefix}.self_attn.q_norm.weight"],
                     cfg.rms_norm_eps)
            k = _rms(k, params[f"{prefix}.self_attn.k_norm.weight"],
                     cfg.rms_norm_eps)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        q, k = apply_rope(q, k, cos, sin)

        if per_row:
            new_ck = _scatter_cache_rows(
                cache_k[i], k.astype(cache_k.dtype), cache_len
            )
            new_cv = _scatter_cache_rows(
                cache_v[i], v.astype(cache_v.dtype), cache_len
            )
        else:
            new_ck = jax.lax.dynamic_update_slice(
                cache_k[i], k.astype(cache_k.dtype), (0, 0, cache_len, 0)
            )
            new_cv = jax.lax.dynamic_update_slice(
                cache_v[i], v.astype(cache_v.dtype), (0, 0, cache_len, 0)
            )
        cache_k = cache_k.at[i].set(new_ck)
        cache_v = cache_v.at[i].set(new_cv)

        qg = q.reshape(b, kvh, g, t, d)
        w = jnp.einsum(
            "bkgsd,bktd->bkgst", qg, new_ck.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) / (d ** 0.5)
        allow_b = (
            allow[None, None, None] if allow.ndim == 2
            else allow[:, None, None]
        )
        w = jnp.where(allow_b, w, -1e30)
        p = jax.nn.softmax(w, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bkgst,bktd->bkgsd", p, new_cv.astype(x.dtype))
        attn = attn.reshape(b, h, t, d).transpose(0, 2, 1, 3).reshape(
            b, t, h * d
        )
        x = residual + attn @ params[f"{prefix}.self_attn.o_proj.weight"].T

        residual = x
        y = _rms(x, params[f"{prefix}.post_attention_layernorm.weight"],
                 cfg.rms_norm_eps)
        gate = y @ params[f"{prefix}.mlp.gate_proj.weight"].T
        up = y @ params[f"{prefix}.mlp.up_proj.weight"].T
        x = residual + (
            (_act(cfg.hidden_act)(gate) * up)
            @ params[f"{prefix}.mlp.down_proj.weight"].T
        )
        if i in capture_set:
            captured[i] = x

    last = _rms(x, params["model.norm.weight"], cfg.rms_norm_eps)
    logits = last @ params["lm_head.weight"].T
    # plain decoding passes no capture layers — a zero-width aux keeps the
    # return pytree stable without paying for the concat
    aux = (
        jnp.concatenate([captured[i] for i in capture_layers], axis=-1)
        if capture_layers else jnp.zeros((b, t, 0), x.dtype)
    )
    return logits, aux, cache_k, cache_v


# --------------------------------------------------------------------------
# cached EAGLE3 draft forward
# --------------------------------------------------------------------------

@dataclass
class DraftState:
    cache_k: jnp.ndarray   # [B, KVH, M, D]
    cache_v: jnp.ndarray
    length: int


def init_draft_state(draft_config, batch: int, max_len: int,
                     dtype=jnp.bfloat16) -> DraftState:
    shape = (
        batch, draft_config.num_key_value_heads, max_len,
        draft_config.resolved_head_dim,
    )
    return DraftState(
        cache_k=jnp.zeros(shape, dtype), cache_v=jnp.zeros(shape, dtype),
        length=0,
    )


def _draft_step(variables, draft_module, input_ids, hidden, cache_k, cache_v,
                cache_len, prefix_valid=None):
    """One cached decoder step: [B, T] tokens + [B, T, h] hidden features →
    (next hidden [B, T, h], logits [B, T, Vd], caches).

    Serving-mode attention is plain causal over the accumulated cache (TTT
    branches are a training-time construct — reference serving drafts decode
    with a standard KV cache). ``cache_len`` may be a [B] vector and
    ``prefix_valid`` a [B, M] pad mask — the batched-serving contract of
    ``target_cached_forward``.
    """
    def run(module):
        cfg = module.config
        b, t = input_ids.shape
        d = cfg.resolved_head_dim
        h_heads, kvh = cfg.num_attention_heads, cfg.num_key_value_heads
        g = h_heads // kvh
        m = cache_k.shape[2]
        clen = jnp.asarray(cache_len, jnp.int32)
        per_row = clen.ndim == 1
        len_col = clen[:, None] if per_row else clen

        embeds = module.embed_input_ids(input_ids).astype(hidden.dtype)
        layer = module.midlayer
        residual = hidden
        normed_hidden = layer.hidden_norm(hidden)
        normed_emb = layer.input_layernorm(embeds)
        x2 = jnp.concatenate([normed_emb, normed_hidden], axis=-1)

        attn = layer.self_attn
        qc, kc = h_heads * d, kvh * d
        qkv = attn.qkv_proj(x2)
        q = qkv[..., :qc].reshape(b, t, h_heads, d).transpose(0, 2, 1, 3)
        k = qkv[..., qc:qc + kc].reshape(b, t, kvh, d).transpose(0, 2, 1, 3)
        v = qkv[..., qc + kc:].reshape(b, t, kvh, d).transpose(0, 2, 1, 3)
        positions = len_col + jnp.arange(t, dtype=jnp.int32)[None]
        positions = jnp.broadcast_to(positions, (b, t))
        cos, sin = rope_cos_sin(attn.rope_spec, positions, m, dtype=q.dtype)
        q, k = apply_rope(q, k, cos, sin)

        if per_row:
            ck = _scatter_cache_rows(cache_k, k.astype(cache_k.dtype), clen)
            cv = _scatter_cache_rows(cache_v, v.astype(cache_v.dtype), clen)
        else:
            ck = jax.lax.dynamic_update_slice(
                cache_k, k.astype(cache_k.dtype), (0, 0, clen, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cache_v, v.astype(cache_v.dtype), (0, 0, clen, 0)
            )
        col = jnp.arange(m, dtype=jnp.int32)[None, :]
        row_pos = jnp.arange(t, dtype=jnp.int32)[:, None]
        if per_row:
            allow = col[None] <= clen[:, None, None] + row_pos[None]
        else:
            allow = col <= clen + row_pos
        if prefix_valid is not None:
            if allow.ndim == 2:
                allow = allow[None] & prefix_valid[:, None, :]
            else:
                allow = allow & prefix_valid[:, None, :]

        qg = q.reshape(b, kvh, g, t, d)
        w = jnp.einsum(
            "bkgsd,bktd->bkgst", qg, ck.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) / (d ** 0.5)
        allow_b = (
            allow[None, None, None] if allow.ndim == 2
            else allow[:, None, None]
        )
        w = jnp.where(allow_b, w, -1e30)
        p = jax.nn.softmax(w, axis=-1).astype(q.dtype)
        out = jnp.einsum("bkgst,bktd->bkgsd", p, cv.astype(q.dtype))
        out = out.reshape(b, h_heads, t, d).transpose(0, 2, 1, 3).reshape(
            b, t, h_heads * d
        )
        x = residual + attn.o_proj(out)
        residual = x
        x = residual + layer.mlp(layer.post_attention_layernorm(x))

        logits = module.compute_logits(x)
        return x, logits, ck, cv

    return draft_module.apply(variables, method=run)


# --------------------------------------------------------------------------
# the speculative decoding loop
# --------------------------------------------------------------------------

@dataclass
class SpecDecodeResult:
    output_ids: np.ndarray          # [total_len] prompt + generated
    accept_lengths: List[int]       # accepted per round (incl. bonus token)
    steps: int

    @property
    def mean_accept_length(self) -> float:
        if not self.accept_lengths:
            return 0.0
        return float(np.mean(self.accept_lengths))


class Eagle3SpecDecoder:
    """Greedy chain speculative decoding (batch 1)."""

    def __init__(
        self,
        target_params,
        target_config: TargetConfig,
        draft_module,                # LlamaEagle3Draft (flax def)
        draft_variables,             # {'params', 'buffers'}
        capture_layers: Sequence[int],
        *,
        num_draft_tokens: int = 4,
        max_len: int = 512,
        mesh=None,
    ) -> None:
        # Pin weights to the device ONCE: exported drafts load as host
        # numpy trees, and numpy jit arguments re-upload on EVERY dispatch
        # — at a 2048h/32k-vocab draft that is ~700 MB per generate, which
        # over a slow host<->device link dwarfs the decode itself (measured
        # 14.6 s per fused prefill before this pin). device_put is a no-op
        # for leaves already on device.
        #
        # ``mesh``: optional device mesh for SHARDED serving — target params
        # spread over the fsdp axis (largest divisible dim per tensor, the
        # same rule the capture runner uses) so targets larger than one
        # chip's HBM can serve; XLA's SPMD partitioner inserts the ICI
        # collectives inside the fused loops. The draft stays replicated
        # (it is small by construction).
        if mesh is not None:
            from specforge_tpu.parallel.mesh import shard_pytree_like_params

            self.target_params = shard_pytree_like_params(
                target_params, mesh
            )
        else:
            self.target_params = jax.device_put(target_params)
        self.mesh = mesh
        self.target_config = target_config
        self.draft = draft_module
        self.draft_variables = jax.device_put(draft_variables)
        self.capture_layers = tuple(capture_layers)
        self.k = num_draft_tokens
        self.max_len = max_len
        self._d2t = self._resolve_d2t(draft_variables)
        self._project = jax.jit(
            lambda variables, aux: draft_module.apply(
                variables, aux, method=draft_module.project_hidden_states
            )
        )
        self._draft_step = jax.jit(
            lambda variables, ids, hidden, ck, cv, clen: _draft_step(
                variables, draft_module, ids, hidden, ck, cv, clen
            )
        )
        self._fused = _FusedEagleLoops(self)

    @staticmethod
    def _resolve_d2t(draft_variables) -> np.ndarray:
        buffers = draft_variables.get("buffers", {})
        if "d2t" in buffers:
            return np.asarray(buffers["d2t"])
        for sub in buffers.values():
            if isinstance(sub, dict) and "d2t" in sub:
                return np.asarray(sub["d2t"])
        raise KeyError("draft variables carry no d2t buffer")

    def _target_forward(self, ids: np.ndarray, state: TargetState):
        logits, aux, ck, cv = target_cached_forward(
            self.target_params, self.target_config,
            jnp.asarray(ids, jnp.int32),
            state.cache_k, state.cache_v,
            jnp.asarray(state.length, jnp.int32),
            self.capture_layers,
        )
        new_state = TargetState(
            cache_k=ck, cache_v=cv, length=state.length + ids.shape[1]
        )
        return np.asarray(logits), aux, new_state

    def _tree_layout(self, topk: int):
        """Static tree-block layout for top-k parallel chains: slot 0 is the
        committed token, chain c occupies slots 1+c*k .. 1+(c+1)*k-1; each
        node attends slot 0 plus its own chain prefix (incl. itself).
        Returns (block_allow [T,T] bool, block_positions [T] int32)."""
        k = self.k
        t = 1 + topk * k
        allow = np.zeros((t, t), bool)
        allow[:, 0] = True
        pos = np.zeros((t,), np.int32)
        for c in range(topk):
            for j in range(k):
                s = 1 + c * k + j
                allow[s, 1 + c * k: s + 1] = True
                pos[s] = j + 1
        return jnp.asarray(allow), jnp.asarray(pos)

    def _chain_from(self, first_draft_idx: int, hidden, ck, cv, clen: int):
        """Greedy draft chain of length self.k from a given draft-vocab
        token, on top of the (immutable) pre-round caches. Chain steps pair
        (previous proposal, draft's own hidden) — the same pairing as later
        TTT steps in training."""
        proposals = [first_draft_idx + int(self._d2t[first_draft_idx])]
        for _ in range(self.k - 1):
            hidden, dlogits, ck, cv = self._draft_step(
                self.draft_variables,
                jnp.asarray([[proposals[-1]]], jnp.int32), hidden,
                ck, cv, jnp.asarray(clen, jnp.int32),
            )
            clen += 1
            dt = int(np.asarray(dlogits[0, -1]).argmax())
            proposals.append(dt + int(self._d2t[dt]))
        return proposals

    def _chains_batched(self, first_draft_idxs, hidden, ck, cv, clen: int):
        """``topk`` greedy chains drafted TOGETHER on the batch axis: one
        ``_draft_step`` per depth (not per chain) — the pre-round caches are
        tiled so every chain extends the same prefix independently."""
        topk = len(first_draft_idxs)
        chains = [
            [int(i) + int(self._d2t[int(i)])] for i in first_draft_idxs
        ]
        hidden_b = jnp.broadcast_to(
            hidden, (topk,) + hidden.shape[1:]
        )
        ck_b = jnp.broadcast_to(ck, (topk,) + ck.shape[1:])
        cv_b = jnp.broadcast_to(cv, (topk,) + cv.shape[1:])
        for _ in range(self.k - 1):
            ids = jnp.asarray(
                [[c[-1]] for c in chains], jnp.int32
            )  # [topk, 1]
            hidden_b, dlogits, ck_b, cv_b = self._draft_step(
                self.draft_variables, ids, hidden_b, ck_b, cv_b,
                jnp.asarray(clen, jnp.int32),
            )
            clen += 1
            dts = np.asarray(dlogits[:, -1]).argmax(axis=-1)  # [topk]
            for c, dt in zip(chains, dts):
                c.append(int(dt) + int(self._d2t[int(dt)]))
        return chains

    def _prefill_device(self, prompt, budget: int):
        """Prefill for the fused paths: everything stays ON DEVICE — the
        host-loop ``_prefill`` materializes the [1, P, V] prefill logits on
        the host, which is pure transfer waste for a fused generate (over a
        debug tunnel it can dominate the whole call)."""
        p_len = prompt.shape[1]
        t_state = init_target_state(self.target_config, 1, budget)
        d_state = init_draft_state(self.draft.config, 1, budget)
        logits, aux, t_ck, t_cv = target_cached_forward(
            self.target_params, self.target_config,
            jnp.asarray(prompt, jnp.int32),
            t_state.cache_k, t_state.cache_v, jnp.asarray(0, jnp.int32),
            self.capture_layers,
        )
        cur = jnp.argmax(logits[0, -1]).astype(jnp.int32)
        draft_hidden = self._project(self.draft_variables, aux)
        shifted = jnp.concatenate(
            [jnp.asarray(prompt[0, 1:], jnp.int32), cur[None]]
        )[None]
        next_hidden, dlogits, d_ck, d_cv = self._draft_step(
            self.draft_variables, shifted, draft_hidden,
            d_state.cache_k, d_state.cache_v, jnp.asarray(0, jnp.int32),
        )
        return (
            cur, TargetState(t_ck, t_cv, p_len),
            DraftState(d_ck, d_cv, p_len),
            next_hidden[:, -1:], dlogits[:, -1],
        )

    def _prefill(self, prompt_ids, prompt, budget: int):
        """Target prefill + the EAGLE draft bootstrap shared by the chain
        and tree paths: the draft consumes teacher-shifted pairs
        (token_{i+1}, feature_i) over the prompt; its final logits already
        predict the first proposal of the next round."""
        p_len = prompt.shape[1]
        t_state = init_target_state(self.target_config, 1, budget)
        d_state = init_draft_state(self.draft.config, 1, budget)
        logits, aux, t_state = self._target_forward(prompt, t_state)
        cur_token = int(logits[0, -1].argmax())
        output = list(prompt_ids) + [cur_token]
        draft_hidden = self._project(self.draft_variables, aux)
        shifted_ids = np.concatenate([prompt[0, 1:], [cur_token]])[None]
        next_hidden, dlogits, ck, cv = self._draft_step(
            self.draft_variables, jnp.asarray(shifted_ids, jnp.int32),
            draft_hidden, d_state.cache_k, d_state.cache_v,
            jnp.asarray(0, jnp.int32),
        )
        d_state = DraftState(cache_k=ck, cache_v=cv, length=p_len)
        return (
            output, cur_token, t_state, d_state,
            next_hidden[:, -1:], np.asarray(dlogits[:, -1]),
        )

    def generate(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: int,
        stop_token_ids: Optional[Sequence[int]] = None,
        topk: int = 1,
    ) -> SpecDecodeResult:
        """``topk > 1``: tree speculation — the draft proposes ``topk``
        greedy chains branching at the round's first token (the top-k of
        the draft distribution), the target verifies ALL of them in ONE
        forward with a tree attention mask, and the longest-matching chain
        wins. Output is greedy-equivalent for any topk; chain 0 is the
        topk=1 proposal, so acceptance per round can only improve."""
        if topk > 1:
            return self._generate_tree(
                prompt_ids, max_new_tokens, stop_token_ids, topk
            )
        stop = set(stop_token_ids or ())
        prompt = np.asarray(prompt_ids, np.int64)[None]  # [1, P]
        p_len = prompt.shape[1]
        budget = self.max_len

        (output, cur_token, t_state, d_state, last_hidden,
         last_dlogits) = self._prefill(prompt_ids, prompt, budget)

        accept_lengths: List[int] = []
        steps = 0
        while (
            len(output) - p_len < max_new_tokens
            and t_state.length + self.k + 1 < budget
        ):
            steps += 1
            # --- draft chain proposal ---
            proposals = self._chain_from(
                int(last_dlogits[0].argmax()), last_hidden,
                d_state.cache_k, d_state.cache_v, d_state.length,
            )

            # --- target verification over [cur, d1..dk] ---
            block = np.asarray([[cur_token, *proposals]], np.int64)
            logits, aux, t_state = self._target_forward(block, t_state)
            posterior = logits[0].argmax(axis=-1)  # [k+1]
            accepted = 0
            for j in range(self.k):
                if proposals[j] == int(posterior[j]):
                    accepted += 1
                else:
                    break
            emitted = [*proposals[:accepted], int(posterior[accepted])]
            output.extend(emitted)
            accept_lengths.append(accepted + 1)

            # --- roll caches back to the accepted prefix ---
            # target: the block wrote k+1 entries; keep accepted+1 of them
            t_state = TargetState(
                cache_k=t_state.cache_k, cache_v=t_state.cache_v,
                length=t_state.length - (self.k + 1) + accepted + 1,
            )
            # draft: re-extend over the accepted block with target features
            # (chain entries beyond d_state.length are simply overwritten)
            accepted_aux = aux[:, : accepted + 1]
            draft_hidden = self._project(self.draft_variables, accepted_aux)
            next_hidden, dlogits, ck, cv = self._draft_step(
                self.draft_variables,
                jnp.asarray([emitted], jnp.int32), draft_hidden,
                d_state.cache_k, d_state.cache_v,
                jnp.asarray(d_state.length, jnp.int32),
            )
            d_state = DraftState(
                cache_k=ck, cache_v=cv,
                length=d_state.length + accepted + 1,
            )
            last_hidden = next_hidden[:, -1:]
            last_dlogits = np.asarray(dlogits[:, -1])
            cur_token = int(posterior[accepted])

            if stop & set(emitted):
                break
        return SpecDecodeResult(
            output_ids=np.asarray(output),
            accept_lengths=accept_lengths,
            steps=steps,
        )

    def generate_fused(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: int,
        stop_token_ids: Optional[Sequence[int]] = None,
        topk: int = 1,
        tree_style: str = "root",
    ) -> SpecDecodeResult:
        """``generate`` with the whole decode loop fused into ONE jitted
        ``lax.while_loop`` program (chain or tree): one device dispatch per
        call instead of ~k+3 per round — the serving-speed path. Emits
        exactly the same tokens and accept lengths as ``generate``
        (parity-tested).

        ``tree_style`` (topk > 1 only): "root" = the host loop's layout
        (topk greedy chains branching at the round's first token);
        "beam" = dynamic per-round tree with branching at EVERY depth by
        cumulative draft log-prob (EAGLE-2 style, fused-only)."""
        stop_ids = tuple(
            sorted(set(int(s) for s in (stop_token_ids or ())))
        )
        prompt = np.asarray(prompt_ids, np.int64)[None]
        p_len = prompt.shape[1]
        budget = self.max_len
        if topk > 1:
            block_t = 1 + topk * self.k
            if p_len + block_t >= budget:
                raise ValueError(
                    f"tree block (1 + topk*k = {block_t}) does not fit "
                    f"max_len={budget} after a {p_len}-token prompt; lower "
                    "topk/draft_tokens or raise max_len"
                )

        (cur, t_state, d_state, last_hidden,
         last_dlogits) = self._prefill_device(prompt, budget)

        if topk <= 1:
            loop = self._fused.chain(stop_ids)
        elif tree_style == "beam":
            loop = self._fused.beam_tree(topk, stop_ids)
        else:
            loop = self._fused.tree(topk, stop_ids)
        out_buf = jnp.zeros((budget + self.k + 1,), jnp.int32)
        out_buf = out_buf.at[0].set(cur)
        acc_buf = jnp.zeros((budget,), jnp.int32)
        buf, out_cnt, accs, n_rounds = loop(
            self.target_params, self.draft_variables,
            t_state.cache_k, t_state.cache_v,
            jnp.asarray(t_state.length, jnp.int32),
            d_state.cache_k, d_state.cache_v,
            jnp.asarray(d_state.length, jnp.int32),
            cur, last_hidden, last_dlogits,
            out_buf, jnp.asarray(1, jnp.int32), acc_buf,
            jnp.asarray(max_new_tokens, jnp.int32),
        )
        out_cnt, n_rounds = int(out_cnt), int(n_rounds)
        output = np.concatenate([
            np.asarray(prompt_ids, np.int64), np.asarray(buf)[:out_cnt],
        ])
        return SpecDecodeResult(
            output_ids=output,
            accept_lengths=[int(a) for a in np.asarray(accs)[:n_rounds]],
            steps=n_rounds,
        )

    def generate_batch_fused(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int,
        stop_token_ids: Optional[Sequence[int]] = None,
        topk: int = 1,
        tree_style: str = "root",
        adaptive: bool = False,
    ) -> List[SpecDecodeResult]:
        """Speculation for a BATCH of prompts in one fused program: rows
        are right-padded (slot == position — each row's numerics are
        exactly its single-row numerics), caches carry per-row lengths, one
        batched target verification serves all rows per round, and finished
        rows freeze while the rest continue. Per-row outputs match
        ``generate_fused`` row by row (parity-tested).

        ``topk > 1`` verifies per-row TREES in the one batched forward:
        ``tree_style="root"`` drafts topk greedy chains per row branching
        at the round's first token; ``"beam"`` branches at EVERY depth by
        cumulative draft log-prob (EAGLE-2 style). ``adaptive`` (chain
        mode) shrinks the per-round draft depth from an accept EMA so
        speculation never falls behind batched plain decoding when the
        draft stops paying."""
        stop_ids = tuple(
            sorted(set(int(s) for s in (stop_token_ids or ())))
        )
        batch = len(prompts)
        lens = np.asarray([len(p) for p in prompts], np.int32)
        p_max = int(lens.max())
        budget = self.max_len
        if topk > 1:
            block_t = 1 + topk * self.k
            if p_max + block_t >= budget:
                raise ValueError(
                    f"tree block (1 + topk*k = {block_t}) does not fit "
                    f"max_len={budget} after a {p_max}-token prompt; lower "
                    "topk/draft_tokens or raise max_len"
                )
        padded = np.zeros((batch, p_max), np.int64)
        for i, p in enumerate(prompts):
            padded[i, : len(p)] = p

        t_state = init_target_state(self.target_config, batch, budget)
        d_state = init_draft_state(self.draft.config, batch, budget)
        logits, aux, t_ck, t_cv = target_cached_forward(
            self.target_params, self.target_config,
            jnp.asarray(padded, jnp.int32),
            t_state.cache_k, t_state.cache_v, jnp.asarray(0, jnp.int32),
            self.capture_layers,
        )
        rows = jnp.arange(batch)
        lens_d = jnp.asarray(lens)
        # per-row last REAL position's argmax, computed on device (pulling
        # [B, P, V] prefill logits to the host is pure transfer waste)
        cur = jnp.take_along_axis(
            jnp.argmax(logits, axis=-1).astype(jnp.int32),
            lens_d[:, None] - 1, axis=1,
        )[:, 0]
        # draft bootstrap: slot j pairs (token_{j+1}, feature_j); the last
        # REAL slot of each row pairs its first generated token
        shifted = jnp.concatenate(
            [jnp.asarray(padded[:, 1:], jnp.int32),
             jnp.zeros((batch, 1), jnp.int32)], axis=1
        )
        shifted = shifted.at[rows, lens_d - 1].set(cur)
        draft_hidden = self._project(self.draft_variables, aux)
        h_out, dlog, d_ck, d_cv = self._draft_step(
            self.draft_variables, shifted,
            draft_hidden, d_state.cache_k, d_state.cache_v,
            jnp.asarray(0, jnp.int32),
        )
        last_h = jnp.take_along_axis(
            h_out, jnp.asarray(lens - 1)[:, None, None], axis=1
        )
        last_dl = jnp.take_along_axis(
            dlog, jnp.asarray(lens - 1)[:, None, None], axis=1
        )[:, 0]

        out_buf = jnp.zeros((batch, budget + self.k + 1), jnp.int32)
        out_buf = out_buf.at[:, 0].set(cur)
        acc_buf = jnp.zeros((batch, budget), jnp.int32)
        if topk > 1 and tree_style == "beam":
            loop = self._fused.batch_beam(batch, topk, stop_ids)
        elif topk > 1:
            loop = self._fused.batch_tree(batch, topk, stop_ids)
        elif adaptive:
            loop = self._fused.batch_chain_adaptive(batch, stop_ids)
        else:
            loop = self._fused.batch_chain(batch, stop_ids)
        buf, out_cnt, accs, n_rounds = loop(
            self.target_params, self.draft_variables, t_ck, t_cv,
            jnp.asarray(lens), d_ck, d_cv, jnp.asarray(lens), cur,
            last_h, last_dl, out_buf, jnp.ones((batch,), jnp.int32),
            acc_buf, jnp.asarray(max_new_tokens, jnp.int32),
        )
        buf = np.asarray(buf)
        out_cnt = np.asarray(out_cnt)
        accs = np.asarray(accs)
        n_rounds = np.asarray(n_rounds)
        results = []
        for i, p in enumerate(prompts):
            results.append(SpecDecodeResult(
                output_ids=np.concatenate(
                    [np.asarray(p, np.int64), buf[i, : out_cnt[i]]]
                ),
                accept_lengths=[int(a) for a in accs[i, : n_rounds[i]]],
                steps=int(n_rounds[i]),
            ))
        return results

    def generate_stream_fused(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int,
        batch: int = 8,
        stop_token_ids: Optional[Sequence[int]] = None,
    ) -> List[SpecDecodeResult]:
        """CONTINUOUS-BATCHING chain speculation: decode a prompt QUEUE at
        a fixed batch width, refilling each row the moment it completes.

        A fixed batch runs for max-over-rows rounds — low-accept rows drag
        the whole batch while finished rows idle (measured bs8: 89 rounds
        vs 40 for the median row — the entire speculative deficit at bs8).
        Here the fused loop exits as soon as ANY row completes (stream
        variant of the same while-loop body), the host harvests the row,
        prefills the next prompt into its slot, and resumes: device work
        is proportional to live rows only — how speculative decoding is
        actually served (the reference measures its serving grids against
        SGLang's continuous-batching scheduler, benchmarks/README.md).

        Per-row outputs equal ``generate_fused`` on the same prompt
        (parity-tested). Results return in input order."""
        stop_ids = tuple(
            sorted(set(int(s) for s in (stop_token_ids or ())))
        )
        n = len(prompts)
        if n == 0:
            return []
        batch = min(batch, n)
        budget = self.max_len
        k = self.k
        for p in prompts:
            if len(p) + k + 1 >= budget:
                raise ValueError(
                    f"prompt of {len(p)} tokens leaves no room for a "
                    f"speculation round within max_len={budget}"
                )
        results: List[Optional[SpecDecodeResult]] = [None] * n

        def prefill(pid):
            prompt = np.asarray(prompts[pid], np.int64)[None]
            return self._prefill_device(prompt, budget)

        states = [prefill(i) for i in range(batch)]
        row_pid: List[Optional[int]] = list(range(batch))
        next_pid = batch
        t_ck = jnp.concatenate([s[1].cache_k for s in states], axis=1)
        t_cv = jnp.concatenate([s[1].cache_v for s in states], axis=1)
        t_len = jnp.asarray([s[1].length for s in states], jnp.int32)
        d_ck = jnp.concatenate([s[2].cache_k for s in states], axis=0)
        d_cv = jnp.concatenate([s[2].cache_v for s in states], axis=0)
        d_len = jnp.asarray([s[2].length for s in states], jnp.int32)
        cur = jnp.stack([s[0] for s in states])
        last_h = jnp.concatenate([s[3] for s in states], axis=0)
        last_dl = jnp.concatenate([s[4] for s in states], axis=0)
        out_buf = jnp.zeros((batch, budget + k + 1), jnp.int32)
        out_buf = out_buf.at[:, 0].set(cur)
        out_cnt = jnp.ones((batch,), jnp.int32)
        acc_buf = jnp.zeros((batch, budget), jnp.int32)
        n_rounds = jnp.zeros((batch,), jnp.int32)
        done = jnp.zeros((batch,), bool)

        stream_loop = self._fused.batch_chain(batch, stop_ids, stream=True)
        drain_loop = self._fused.batch_chain(batch, stop_ids)
        max_new = jnp.asarray(max_new_tokens, jnp.int32)

        def harvest(b, buf_h, cnt_h, acc_h, rounds_h):
            pid = row_pid[b]
            results[pid] = SpecDecodeResult(
                output_ids=np.concatenate([
                    np.asarray(prompts[pid], np.int64),
                    buf_h[b, : cnt_h[b]],
                ]),
                accept_lengths=[int(a) for a in acc_h[b, : rounds_h[b]]],
                steps=int(rounds_h[b]),
            )
            row_pid[b] = None

        while True:
            carry = stream_loop(
                self.target_params, self.draft_variables, t_ck, t_cv,
                t_len, d_ck, d_cv, d_len, cur, last_h, last_dl, out_buf,
                out_cnt, acc_buf, max_new, n_rounds, done,
            )
            (t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h, last_dl,
             out_buf, out_cnt, acc_buf, n_rounds, done) = carry
            status = np.asarray(
                _pack_stream_status(t_len, out_cnt, n_rounds, done)
            )
            t_len_h, cnt_h, rounds_h = status[0], status[1], status[2]
            done_h = status[3].astype(bool)
            live = (
                (~done_h)
                & (cnt_h < max_new_tokens)
                & (t_len_h + k + 1 < budget)
            )
            finished = [
                b for b in np.where(~live)[0] if row_pid[b] is not None
            ]
            if finished:
                buf_h = np.asarray(out_buf)
                acc_h = np.asarray(acc_buf)
                for b in finished:
                    harvest(int(b), buf_h, cnt_h, acc_h, rounds_h)
            refilled = False
            for b in finished:
                if next_pid >= n:
                    break
                pc, t_state, d_state, lh, ldl = prefill(next_pid)
                row_pid[int(b)] = next_pid
                next_pid += 1
                (t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h,
                 last_dl, out_buf, out_cnt, acc_buf, n_rounds, done) = (
                    _splice_stream_row(
                        t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h,
                        last_dl, out_buf, out_cnt, acc_buf, n_rounds, done,
                        jnp.asarray(int(b), jnp.int32),
                        t_state.cache_k, t_state.cache_v,
                        jnp.asarray(t_state.length, jnp.int32),
                        d_state.cache_k, d_state.cache_v, pc, lh, ldl,
                    )
                )
                refilled = True
            if not refilled:
                break

        if any(pid is not None for pid in row_pid):
            # queue exhausted: drain the remaining live rows (cond = any)
            buf, cnt, accs, rnds = drain_loop(
                self.target_params, self.draft_variables, t_ck, t_cv,
                t_len, d_ck, d_cv, d_len, cur, last_h, last_dl, out_buf,
                out_cnt, acc_buf, max_new, n_rounds, done,
            )
            buf_h = np.asarray(buf)
            cnt_h = np.asarray(cnt)
            acc_h = np.asarray(accs)
            rounds_h = np.asarray(rnds)
            for b in range(batch):
                if row_pid[b] is not None:
                    harvest(b, buf_h, cnt_h, acc_h, rounds_h)
        return results  # type: ignore[return-value]

    def _generate_tree(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: int,
        stop_token_ids: Optional[Sequence[int]],
        topk: int,
    ) -> SpecDecodeResult:
        stop = set(stop_token_ids or ())
        k = self.k
        draft_vocab = int(self._d2t.shape[0])
        if topk > draft_vocab:
            raise ValueError(
                f"topk={topk} exceeds the draft vocab size {draft_vocab}"
            )
        block_allow, block_pos = self._tree_layout(topk)
        block_t = 1 + topk * k
        prompt = np.asarray(prompt_ids, np.int64)[None]
        p_len = prompt.shape[1]
        budget = self.max_len
        if p_len + block_t >= budget:
            # a silent zero-round generate would report accept_length 0.0
            # in the benchmark grid — refuse loudly instead
            raise ValueError(
                f"tree block (1 + topk*k = {block_t}) does not fit "
                f"max_len={budget} after a {p_len}-token prompt; lower "
                "topk/draft_tokens or raise max_len"
            )

        (output, cur_token, t_state, d_state, last_hidden,
         last_dlogits) = self._prefill(prompt_ids, prompt, budget)

        accept_lengths: List[int] = []
        steps = 0
        while (
            len(output) - p_len < max_new_tokens
            and t_state.length + block_t < budget
        ):
            steps += 1
            # --- topk chains branching at the first proposal, drafted
            # together on the batch axis (one step per depth); stable
            # descending sort: ties resolve to the lowest index so chain 0
            # is exactly the chain-mode (argmax) proposal ---
            first = np.argsort(-last_dlogits[0], kind="stable")[:topk]
            chains = self._chains_batched(
                first, last_hidden, d_state.cache_k, d_state.cache_v,
                d_state.length,
            )

            # --- ONE target forward verifies the whole tree ---
            block = np.asarray(
                [[cur_token, *[t for c in chains for t in c]]], np.int64
            )
            base_len = t_state.length
            logits, aux, ck_t, cv_t = target_cached_forward(
                self.target_params, self.target_config,
                jnp.asarray(block, jnp.int32),
                t_state.cache_k, t_state.cache_v,
                jnp.asarray(base_len, jnp.int32),
                self.capture_layers,
                block_allow=block_allow, block_positions=block_pos,
            )
            post = np.asarray(logits[0]).argmax(axis=-1)  # [block_t]

            best_c, best_acc = 0, -1
            for c, chain in enumerate(chains):
                acc = 0
                pred = int(post[0])  # slot 0 predicts every chain's token 0
                for j in range(k):
                    if chain[j] != pred:
                        break
                    acc += 1
                    pred = int(post[1 + c * k + j])
                if acc > best_acc:
                    best_c, best_acc = c, acc
            chain = chains[best_c]
            acc = best_acc
            bonus = int(post[0]) if acc == 0 else int(post[1 + best_c * k + acc - 1])
            emitted = [*chain[:acc], bonus]
            output.extend(emitted)
            accept_lengths.append(acc + 1)

            # --- compact the target cache: keep slot 0 (cur) and the
            # winner's accepted slots, moved to the canonical positions ---
            cache_k, cache_v = ck_t, cv_t
            if acc > 0 and best_c > 0:
                src = base_len + 1 + best_c * k
                dst = base_len + 1
                cache_k = _move_cache_rows(cache_k, src, dst, acc)
                cache_v = _move_cache_rows(cache_v, src, dst, acc)
            t_state = TargetState(
                cache_k=cache_k, cache_v=cache_v,
                length=base_len + acc + 1,
            )

            # --- draft re-extension over the accepted path ---
            slots = [0] + [1 + best_c * k + j for j in range(acc)]
            # gather stays on device (the chain path slices aux on device
            # too); a numpy round-trip here would D2H the full tree block's
            # aux every round
            accepted_aux = jnp.take(aux, jnp.asarray(slots), axis=1)
            draft_hidden = self._project(self.draft_variables, accepted_aux)
            next_hidden, dlogits, ck, cv = self._draft_step(
                self.draft_variables,
                jnp.asarray([emitted], jnp.int32), draft_hidden,
                d_state.cache_k, d_state.cache_v,
                jnp.asarray(d_state.length, jnp.int32),
            )
            d_state = DraftState(
                cache_k=ck, cache_v=cv, length=d_state.length + acc + 1,
            )
            last_hidden = next_hidden[:, -1:]
            last_dlogits = np.asarray(dlogits[:, -1])
            cur_token = bonus

            if stop & set(emitted):
                break
        return SpecDecodeResult(
            output_ids=np.asarray(output),
            accept_lengths=accept_lengths,
            steps=steps,
        )


@functools.partial(jax.jit, static_argnames=("n",))
def _move_cache_rows(cache, src, dst, n: int):
    """Move ``n`` cache rows (axis 3 = slots of [L, B, KVH, M, D]) from
    ``src`` to ``dst`` — tree-cache compaction onto the accepted path."""
    seg = jax.lax.dynamic_slice_in_dim(cache, src, n, axis=3)
    return jax.lax.dynamic_update_slice_in_dim(cache, seg, dst, axis=3)


@jax.jit
def _pack_stream_status(t_len, out_cnt, n_rounds, done):
    """One [4, B] device array so the stream driver pays ONE host fetch
    per refill cycle instead of four (each fetch is a full round trip on
    a remote-device link)."""
    return jnp.stack([t_len, out_cnt, n_rounds, done.astype(jnp.int32)])


@jax.jit
def _splice_stream_row(t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h,
                       last_dl, out_buf, out_cnt, acc_buf, n_rounds, done,
                       b, new_tck, new_tcv, p_len, new_dck, new_dcv,
                       new_cur, new_lh, new_ldl):
    """Continuous batching refill: install a freshly prefilled prompt's
    bs1 state into row ``b`` of the batched stream carry."""
    t_ck = t_ck.at[:, b].set(new_tck[:, 0])
    t_cv = t_cv.at[:, b].set(new_tcv[:, 0])
    t_len = t_len.at[b].set(p_len)
    d_ck = d_ck.at[b].set(new_dck[0])
    d_cv = d_cv.at[b].set(new_dcv[0])
    d_len = d_len.at[b].set(p_len)
    cur = cur.at[b].set(new_cur)
    last_h = last_h.at[b].set(new_lh[0])
    last_dl = last_dl.at[b].set(new_ldl[0])
    row = jnp.zeros((out_buf.shape[1],), jnp.int32).at[0].set(new_cur)
    out_buf = out_buf.at[b].set(row)
    out_cnt = out_cnt.at[b].set(1)
    acc_buf = acc_buf.at[b].set(jnp.zeros((acc_buf.shape[1],), jnp.int32))
    n_rounds = n_rounds.at[b].set(0)
    done = done.at[b].set(False)
    return (t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h, last_dl,
            out_buf, out_cnt, acc_buf, n_rounds, done)


def _gather_scatter_cache_rows(cache, src_idx, dst_idx):
    """Move arbitrary per-row slot sets in ONE gather + ONE scatter:
    ``cache[l, b, :, dst_idx[b, j]] = cache[l, b, :, src_idx[b, j]]`` for
    cache [L, B, KVH, M, D]. Replaces sequences of per-depth
    ``_move_cache_rows`` calls (k sequential whole-cache updates per round
    — the beam loops' dominant bookkeeping cost)."""
    b = cache.shape[1]
    seg = jnp.take_along_axis(
        cache, src_idx[None, :, None, :, None], axis=3
    )                                                       # [L,B,KVH,n,D]
    rows = jnp.arange(b)
    return cache.at[:, rows[:, None], :, dst_idx].set(
        seg.transpose(1, 3, 0, 2, 4), mode="drop"
    )


def _move_cache_rows_batched(cache, src, dst, n: int):
    """Per-row tree-cache compaction: move ``n`` slots of row ``b`` from
    ``src[b]`` to ``dst[b]`` (axis 3 of [L, B, KVH, M, D]) — the batched
    counterpart of ``_move_cache_rows`` when rows pick different winning
    chains at different lengths."""
    b = cache.shape[1]
    steps = jnp.arange(n, dtype=jnp.int32)
    sidx = src[:, None] + steps                              # [B, n]
    seg = jnp.take_along_axis(
        cache, sidx[None, :, None, :, None], axis=3
    )                                                        # [L,B,KVH,n,D]
    didx = dst[:, None] + steps
    rows = jnp.arange(b)
    # advanced index arrays at axes (1, 3) are separated by a slice, so the
    # broadcast [B, n] axes move to the FRONT of the updated view
    return cache.at[:, rows[:, None], :, didx].set(
        seg.transpose(1, 3, 0, 2, 4), mode="drop"
    )


# --------------------------------------------------------------------------
# fused decoding: the WHOLE decode loop as one jitted program
# --------------------------------------------------------------------------
#
# The host-loop ``generate`` above dispatches ~k+3 device programs per
# speculative round (and syncs the draft argmax to the host between chain
# steps). On TPU the per-dispatch latency dominates at serving batch 1, so
# the fused path lowers the ENTIRE generate — draft chain, target
# verification, acceptance, cache bookkeeping, draft re-extension — into a
# single ``lax.while_loop`` program: ONE dispatch per generate call, zero
# host syncs inside the loop. Output/accept-length buffers are
# fixed-capacity with counts (static shapes), and stale cache slots are
# always overwritten before they become attendable (the same
# masked-fixed-shape discipline as training). Greedy-equivalence and
# host-loop parity are enforced by tests/test_spec_decode.py.


def _fused_stop_hit(emitted, valid, stop_ids):
    """Any ACCEPTED emitted token in the (static) stop set?"""
    if not stop_ids:
        return jnp.asarray(False)
    hits = jnp.zeros(emitted.shape, bool)
    for s in stop_ids:
        hits = hits | (emitted == s)
    return jnp.any(hits & valid)


def _fused_stop_hit_rows(emitted, valid, stop_ids):
    """Per-row stop check for batched decoding: [B, T] -> [B]."""
    if not stop_ids:
        return jnp.zeros(emitted.shape[:1], bool)
    hits = jnp.zeros(emitted.shape, bool)
    for s in stop_ids:
        hits = hits | (emitted == s)
    return jnp.any(hits & valid, axis=1)


class _FusedEagleLoops:
    """Compiled whole-generate loops for one Eagle3SpecDecoder.

    One compilation per (k, topk, stop-set, buffer shapes); prompts of any
    length reuse it (prefill is a separate per-length program, as in the
    host path)."""

    def __init__(self, decoder: "Eagle3SpecDecoder"):
        self.decoder = decoder
        self._cache: Dict[Any, Any] = {}

    def chain(self, stop_ids: Tuple[int, ...]):
        key = ("chain", stop_ids)
        if key not in self._cache:
            self._cache[key] = jax.jit(self._build_chain(stop_ids))
        return self._cache[key]

    def tree(self, topk: int, stop_ids: Tuple[int, ...]):
        key = ("tree", topk, stop_ids)
        if key not in self._cache:
            self._cache[key] = jax.jit(self._build_tree(topk, stop_ids))
        return self._cache[key]

    def beam_tree(self, m: int, stop_ids: Tuple[int, ...]):
        key = ("beam", m, stop_ids)
        if key not in self._cache:
            self._cache[key] = jax.jit(self._build_beam_tree(m, stop_ids))
        return self._cache[key]

    # -- shared pieces (weights passed as arguments, not closure constants,
    #    so the compiled loop doesn't bake multi-GB params into the jaxpr) --

    def _draft(self, variables, ids, hidden, ck, cv, clen):
        return _draft_step(variables, self.decoder.draft, ids, hidden, ck,
                           cv, clen)

    def _project(self, variables, aux):
        draft = self.decoder.draft
        return draft.apply(variables, aux,
                           method=draft.project_hidden_states)

    def _chain_propose(self, variables, first_dlogits, hidden, d_ck, d_cv,
                       d_len, d2t):
        """k greedy chain proposals, fully on device (the host version syncs
        an argmax per step)."""
        k = self.decoder.k
        p = jnp.argmax(first_dlogits[0]).astype(jnp.int32)
        toks = [p + d2t[p]]
        h, ck, cv, clen = hidden, d_ck, d_cv, d_len
        for _ in range(k - 1):
            h, dlog, ck, cv = self._draft(
                variables, toks[-1][None, None], h, ck, cv, clen
            )
            clen = clen + 1
            dt = jnp.argmax(dlog[0, -1]).astype(jnp.int32)
            toks.append(dt + d2t[dt])
        return jnp.stack(toks)  # [k] target-vocab

    # -- chain mode --------------------------------------------------------

    def _build_chain(self, stop_ids: Tuple[int, ...]):
        d = self.decoder
        k = d.k
        d2t = jnp.asarray(d._d2t, jnp.int32)
        idx = jnp.arange(k + 1, dtype=jnp.int32)

        def loop(target_params, variables, t_ck, t_cv, t_len, d_ck, d_cv,
                 d_len, cur, last_h, last_dl, out_buf, out_cnt, acc_buf,
                 max_new):
            budget = t_ck.shape[3]

            def cond(carry):
                (_tck, _tcv, t_len, *_rest, out_cnt, _accb, n_rounds,
                 done) = carry
                return (
                    (~done)
                    & (out_cnt < max_new)
                    & (t_len + k + 1 < budget)
                )

            def body(carry):
                (t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h, last_dl,
                 out_buf, out_cnt, acc_buf, n_rounds, done) = carry
                proposals = self._chain_propose(
                    variables, last_dl, last_h, d_ck, d_cv, d_len, d2t
                )
                block = jnp.concatenate([cur[None], proposals])[None]
                logits, aux, t_ck, t_cv = target_cached_forward(
                    target_params, d.target_config, block, t_ck, t_cv,
                    t_len, d.capture_layers,
                )
                posterior = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
                matches = (proposals == posterior[:k]).astype(jnp.int32)
                acc = jnp.sum(jnp.cumprod(matches))
                bonus = posterior[acc]
                props_p = jnp.concatenate([proposals, bonus[None]])
                emitted = jnp.where(idx < acc, props_p, bonus)  # [k+1]

                out_buf = jax.lax.dynamic_update_slice(
                    out_buf, emitted, (out_cnt,)
                )
                acc_buf = jax.lax.dynamic_update_slice(
                    acc_buf, (acc + 1)[None], (n_rounds,)
                )

                # draft re-extension over the full block: positions beyond
                # acc write garbage cache slots that are overwritten before
                # they can be attended (see module comment)
                hidden_full = self._project(variables, aux)
                h_out, dlog_out, d_ck, d_cv = self._draft(
                    variables, emitted[None], hidden_full, d_ck, d_cv, d_len
                )
                last_h = jax.lax.dynamic_slice(
                    h_out, (0, acc, 0), (1, 1, h_out.shape[2])
                )
                last_dl = jax.lax.dynamic_slice(
                    dlog_out, (0, acc, 0), (1, 1, dlog_out.shape[2])
                )[:, 0]
                done = _fused_stop_hit(emitted, idx <= acc, stop_ids)
                return (
                    t_ck, t_cv, t_len + acc + 1, d_ck, d_cv,
                    d_len + acc + 1, bonus, last_h, last_dl, out_buf,
                    out_cnt + acc + 1, acc_buf, n_rounds + 1, done,
                )

            init = (
                t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h, last_dl,
                out_buf, out_cnt, acc_buf, jnp.asarray(0, jnp.int32),
                jnp.asarray(False),
            )
            final = jax.lax.while_loop(cond, body, init)
            return final[9], final[10], final[11], final[12]

        return loop

    # -- beam tree mode (dynamic per-round tree, EAGLE-2 style) ------------

    def _build_beam_tree(self, m: int, stop_ids: Tuple[int, ...]):
        """Tree speculation with branching at EVERY depth: level d keeps the
        top-m nodes by CUMULATIVE draft log-prob among its m*m candidate
        children (beam search over the draft), so high-uncertainty positions
        spread the verification budget across alternatives instead of
        committing to one chain per root token (the root-branching ``tree``
        mode). The tree shape is DYNAMIC per round — the attention mask is
        built on device from parent pointers, and the target verifies the
        whole 1 + k*m block in one forward. Greedy-equivalent like every
        mode (acceptance walks posterior-matching edges only).

        Note: unlike root-branching, the pure greedy chain is not guaranteed
        to survive the beam (its cumulative log-prob can fall out of the
        top-m at a later level), so per-round acceptance is not a superset
        of chain mode — it wins on average, not pointwise (EAGLE-2 has the
        same property)."""
        d = self.decoder
        k = d.k
        d2t = jnp.asarray(d._d2t, jnp.int32)
        block_t = 1 + k * m
        kidx = jnp.arange(k + 1, dtype=jnp.int32)

        def expand(variables, last_dl, hidden, d_ck, d_cv, d_len):
            """Beam expansion: returns (tokens [k, m] target-vocab,
            parent_idx [k, m] in 0..m-1 (level-local; level 0 parents are
            the committed slot), and per-level draft state)."""
            logp = jax.nn.log_softmax(
                last_dl[0].astype(jnp.float32)
            )                                           # [Vd]
            val, tok_d = jax.lax.top_k(logp, m)         # level 0
            tokens = [tok_d + jnp.take(d2t, tok_d)]     # target vocab [m]
            parents = [jnp.zeros((m,), jnp.int32)]      # sentinel: root
            cum = val                                    # [m]
            h = jnp.broadcast_to(hidden, (m,) + hidden.shape[1:])
            ck = jnp.broadcast_to(d_ck, (m,) + d_ck.shape[1:])
            cv = jnp.broadcast_to(d_cv, (m,) + d_cv.shape[1:])
            clen = d_len
            for _depth in range(1, k):
                h, dlog, ck, cv = self._draft(
                    variables, tokens[-1][:, None], h, ck, cv, clen
                )
                clen = clen + 1
                lp = jax.nn.log_softmax(
                    dlog[:, -1].astype(jnp.float32), axis=-1
                )                                        # [m, Vd]
                child_val, child_tok = jax.lax.top_k(lp, m)   # [m, m]
                cand = (cum[:, None] + child_val).reshape(-1)  # [m*m]
                top_val, top_idx = jax.lax.top_k(cand, m)
                parent = (top_idx // m).astype(jnp.int32)      # [m]
                tok_d = child_tok.reshape(-1)[top_idx].astype(jnp.int32)
                cum = top_val
                # reorder the beam state onto the selected parents
                h = h[parent]
                ck = ck[parent]
                cv = cv[parent]
                tokens.append(tok_d + jnp.take(d2t, tok_d))
                parents.append(parent)
            return jnp.stack(tokens), jnp.stack(parents)   # [k, m] each

        def build_allow(parents):
            """[T, T] ancestor mask from level-local parent pointers: row =
            a node's visible block slots (slot 0 + its ancestors + itself)."""
            allow = jnp.zeros((block_t, block_t), bool)
            allow = allow.at[:, 0].set(True)
            # rows built level by level: row(d, i) = row(d-1, parent) | self
            prev_rows = jnp.zeros((m, block_t), bool)      # level -1 = root
            for depth in range(k):
                slots = 1 + depth * m + jnp.arange(m)      # [m]
                base = (
                    prev_rows[parents[depth]] if depth > 0
                    else jnp.zeros((m, block_t), bool)
                )
                rows = base.at[jnp.arange(m), slots].set(True)
                rows = rows.at[:, 0].set(True)
                allow = jax.lax.dynamic_update_slice(
                    allow, rows, (1 + depth * m, 0)
                )
                prev_rows = rows
            return allow

        def accept_walk(tokens, parents, post):
            """Walk posterior-matching edges down the tree: returns
            (acc, path_slots [k] int32, path_tokens [k], bonus)."""
            cur_slot = jnp.asarray(0, jnp.int32)
            alive = jnp.asarray(True)
            acc = jnp.asarray(0, jnp.int32)
            path_slots = jnp.zeros((k,), jnp.int32)
            path_tokens = jnp.zeros((k,), jnp.int32)
            for depth in range(k):
                want = post[cur_slot]
                if depth == 0:
                    ok = tokens[0] == want                 # [m]
                else:
                    parent_local = (cur_slot - 1) - (depth - 1) * m
                    ok = (
                        (parents[depth] == parent_local)
                        & (tokens[depth] == want)
                    )
                hit = alive & jnp.any(ok)
                child = jnp.argmax(ok).astype(jnp.int32)
                slot = 1 + depth * m + child
                cur_slot = jnp.where(hit, slot, cur_slot)
                acc = acc + hit.astype(jnp.int32)
                path_slots = path_slots.at[depth].set(
                    jnp.where(hit, slot, 0)
                )
                path_tokens = path_tokens.at[depth].set(
                    jnp.where(hit, want, 0)
                )
                alive = hit
            bonus = post[cur_slot]
            return acc, path_slots, path_tokens, bonus

        def loop(target_params, variables, t_ck, t_cv, t_len, d_ck, d_cv,
                 d_len, cur, last_h, last_dl, out_buf, out_cnt, acc_buf,
                 max_new):
            budget = t_ck.shape[3]
            depth_pos = jnp.concatenate([
                jnp.zeros((1,), jnp.int32),
                1 + jnp.repeat(jnp.arange(k, dtype=jnp.int32), m),
            ])                                             # [T] rope depths

            def cond(carry):
                (_tck, _tcv, t_len, *_rest, out_cnt, _accb, n_rounds,
                 done) = carry
                return (
                    (~done)
                    & (out_cnt < max_new)
                    & (t_len + block_t < budget)
                )

            def body(carry):
                (t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h, last_dl,
                 out_buf, out_cnt, acc_buf, n_rounds, done) = carry
                tokens, parents = expand(
                    variables, last_dl, last_h, d_ck, d_cv, d_len
                )
                allow = build_allow(parents)
                block = jnp.concatenate(
                    [cur[None], tokens.reshape(-1)]
                )[None]
                base_len = t_len
                logits, aux, t_ck, t_cv = target_cached_forward(
                    target_params, d.target_config, block, t_ck, t_cv,
                    base_len, d.capture_layers,
                    block_allow=allow, block_positions=depth_pos,
                )
                post = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
                acc, path_slots, path_tokens, bonus = accept_walk(
                    tokens, parents, post
                )
                path_p = jnp.concatenate([path_tokens, bonus[None]])
                emitted = jnp.where(kidx < acc, path_p, bonus)   # [k+1]

                out_buf = jax.lax.dynamic_update_slice(
                    out_buf, emitted, (out_cnt,)
                )
                acc_buf = jax.lax.dynamic_update_slice(
                    acc_buf, (acc + 1)[None], (n_rounds,)
                )

                # compact the accepted path onto canonical cache slots in
                # ONE gather+scatter (rejected-depth moves land past the
                # new length and are overwritten before becoming
                # attendable)
                src_idx = (base_len + path_slots)[None]        # [1, k]
                dst_idx = (base_len + 1 + jnp.arange(k))[None]
                t_ck = _gather_scatter_cache_rows(t_ck, src_idx, dst_idx)
                t_cv = _gather_scatter_cache_rows(t_cv, src_idx, dst_idx)

                # draft re-extension over slot 0 + the accepted path slots
                slots = jnp.concatenate([
                    jnp.zeros((1,), jnp.int32), path_slots,
                ])
                aux_sel = jnp.take(aux, slots, axis=1)
                hidden_full = self._project(variables, aux_sel)
                h_out, dlog_out, d_ck, d_cv = self._draft(
                    variables, emitted[None], hidden_full, d_ck, d_cv, d_len
                )
                last_h = jax.lax.dynamic_slice(
                    h_out, (0, acc, 0), (1, 1, h_out.shape[2])
                )
                last_dl = jax.lax.dynamic_slice(
                    dlog_out, (0, acc, 0), (1, 1, dlog_out.shape[2])
                )[:, 0]
                done = _fused_stop_hit(emitted, kidx <= acc, stop_ids)
                return (
                    t_ck, t_cv, base_len + acc + 1, d_ck, d_cv,
                    d_len + acc + 1, bonus, last_h, last_dl, out_buf,
                    out_cnt + acc + 1, acc_buf, n_rounds + 1, done,
                )

            init = (
                t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h, last_dl,
                out_buf, out_cnt, acc_buf, jnp.asarray(0, jnp.int32),
                jnp.asarray(False),
            )
            final = jax.lax.while_loop(cond, body, init)
            return final[9], final[10], final[11], final[12]

        return loop

    # -- batched chain mode ------------------------------------------------

    def batch_chain(self, batch: int, stop_ids: Tuple[int, ...],
                    stream: bool = False):
        key = ("batch_chain", batch, stop_ids, stream)
        if key not in self._cache:
            self._cache[key] = jax.jit(
                self._build_batch_chain(batch, stop_ids, stream)
            )
        return self._cache[key]

    def _build_batch_chain(self, batch: int, stop_ids: Tuple[int, ...],
                           stream: bool = False):
        """B prompts decoded together: rows are RIGHT-padded (slot ==
        position, so each row's math is exactly its unpadded math — stale
        pad slots are overwritten before they become attendable, the same
        discipline as stale verify slots), caches carry PER-ROW lengths
        (scatter writes), one batched target verify serves the whole batch
        per round, and finished rows are frozen by where-selecting the old
        carry. The reference grid's batch dimension
        (benchmarks/README.md:11-67), served natively.

        ``stream=True`` builds the CONTINUOUS-BATCHING variant: the loop
        runs only while EVERY row is live and returns the FULL carry, so
        the host can harvest any finished row, splice in the next prompt
        from the queue, and resume — the fix for lockstep round-count
        waste (measured: a fixed bs8 batch takes max-row rounds, 89 vs 40,
        while frozen rows idle; a refilled stream pays only for live
        work). The while-loop body is byte-identical in both variants."""
        d = self.decoder
        k = d.k
        d2t = jnp.asarray(d._d2t, jnp.int32)
        idx = jnp.arange(k + 1, dtype=jnp.int32)
        rows = jnp.arange(batch, dtype=jnp.int32)

        def propose(variables, last_dl, hidden, d_ck, d_cv, d_len):
            p = jnp.argmax(last_dl, axis=-1).astype(jnp.int32)   # [B]
            toks = [p + jnp.take(d2t, p)]
            h, ck, cv, clen = hidden, d_ck, d_cv, d_len
            for _ in range(k - 1):
                h, dlog, ck, cv = self._draft(
                    variables, toks[-1][:, None], h, ck, cv, clen
                )
                clen = clen + 1
                dt = jnp.argmax(dlog[:, -1], axis=-1).astype(jnp.int32)
                toks.append(dt + jnp.take(d2t, dt))
            return jnp.stack(toks, axis=1)                       # [B, k]

        def loop(target_params, variables, t_ck, t_cv, t_len, d_ck, d_cv,
                 d_len, cur, last_h, last_dl, out_buf, out_cnt, acc_buf,
                 max_new, n_rounds=None, done=None):
            budget = t_ck.shape[3]

            def active_rows(t_len, out_cnt, done):
                return (
                    (~done)
                    & (out_cnt < max_new)
                    & (t_len + k + 1 < budget)
                )

            def cond(carry):
                t_len, out_cnt, done = carry[2], carry[10], carry[13]
                live = active_rows(t_len, out_cnt, done)
                # stream: hand control back as soon as ANY row completes so
                # the host can refill its slot from the queue
                return jnp.all(live) if stream else jnp.any(live)

            def body(carry):
                (t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h,
                 last_dl, out_buf, out_cnt, acc_buf, n_rounds, done) = carry
                active = active_rows(t_len, out_cnt, done)       # [B]

                proposals = propose(
                    variables, last_dl, last_h, d_ck, d_cv, d_len
                )                                                # [B, k]
                block = jnp.concatenate([cur[:, None], proposals], axis=1)
                logits, aux, n_tck, n_tcv = target_cached_forward(
                    target_params, d.target_config, block, t_ck, t_cv,
                    t_len, d.capture_layers,
                )
                posterior = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                matches = (proposals == posterior[:, :k]).astype(jnp.int32)
                acc = jnp.sum(jnp.cumprod(matches, axis=1), axis=1)  # [B]
                bonus = jnp.take_along_axis(
                    posterior, acc[:, None], axis=1
                )[:, 0]
                props_p = jnp.concatenate(
                    [proposals, bonus[:, None]], axis=1
                )
                emitted = jnp.where(
                    idx[None] < acc[:, None], props_p, bonus[:, None]
                )                                                # [B, k+1]

                pos = out_cnt[:, None] + idx[None]               # [B, k+1]
                old_out = out_buf[rows[:, None], pos]
                out_buf = out_buf.at[rows[:, None], pos].set(
                    jnp.where(active[:, None], emitted, old_out),
                    mode="drop",
                )
                old_acc = acc_buf[rows, n_rounds]
                acc_buf = acc_buf.at[rows, n_rounds].set(
                    jnp.where(active, acc + 1, old_acc), mode="drop"
                )

                hidden_full = self._project(variables, aux)
                h_out, dlog_out, n_dck, n_dcv = self._draft(
                    variables, emitted, hidden_full, d_ck, d_cv, d_len
                )
                n_last_h = jnp.take_along_axis(
                    h_out, acc[:, None, None], axis=1
                )                                                # [B, 1, H]
                n_last_dl = jnp.take_along_axis(
                    dlog_out, acc[:, None, None], axis=1
                )[:, 0]
                hit = _fused_stop_hit_rows(
                    emitted, idx[None] <= acc[:, None], stop_ids
                )

                # freeze finished rows: keep their old carry wholesale
                a1 = active[:, None]
                t_ck = jnp.where(
                    active[None, :, None, None, None], n_tck, t_ck
                )
                t_cv = jnp.where(
                    active[None, :, None, None, None], n_tcv, t_cv
                )
                d_ck = jnp.where(active[:, None, None, None], n_dck, d_ck)
                d_cv = jnp.where(active[:, None, None, None], n_dcv, d_cv)
                last_h = jnp.where(active[:, None, None], n_last_h, last_h)
                last_dl = jnp.where(a1, n_last_dl, last_dl)
                step = jnp.where(active, acc + 1, 0)
                return (
                    t_ck, t_cv, t_len + step, d_ck, d_cv, d_len + step,
                    jnp.where(active, bonus, cur), last_h, last_dl,
                    out_buf, out_cnt + step, acc_buf,
                    n_rounds + active.astype(jnp.int32),
                    done | (active & hit),
                )

            init = (
                t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h, last_dl,
                out_buf, out_cnt, acc_buf,
                jnp.zeros((batch,), jnp.int32) if n_rounds is None
                else n_rounds,
                jnp.zeros((batch,), bool) if done is None else done,
            )
            final = jax.lax.while_loop(cond, body, init)
            if stream:
                return final           # full carry: the host resumes with it
            return final[9], final[10], final[11], final[12]

        return loop

    # -- adaptive batched chain mode ---------------------------------------

    def batch_chain_adaptive(self, batch: int, stop_ids: Tuple[int, ...]):
        key = ("batch_chain_adaptive", batch, stop_ids)
        if key not in self._cache:
            self._cache[key] = jax.jit(
                self._build_batch_chain_adaptive(batch, stop_ids)
            )
        return self._cache[key]

    # adaptive-policy constants: EMA smoothing, the depth rule, and the
    # one-way plain fallback threshold. accept EMA ~e means the draft is
    # matching ~e tokens per round, so drafting to depth floor(e+0.5)+1
    # keeps one exploratory token past the expected accept; an EMA under
    # OFF_THRESH (matching barely beyond chance) means each spec round's
    # draft+capture overhead outweighs the extra tokens — fall back to
    # plain decoding permanently (the draft state goes stale, which is why
    # the fallback is one-way).
    ADAPT_ALPHA = 0.125
    ADAPT_OFF_THRESH = 0.35
    ADAPT_WARMUP_ROUNDS = 8

    def _build_batch_chain_adaptive(self, batch: int,
                                    stop_ids: Tuple[int, ...]):
        """``_build_batch_chain`` with a DYNAMIC per-round draft depth
        ``k_eff`` driven by an accept-length EMA, and a one-way fallback to
        plain decoding when the draft stops paying — the reference serves
        fixed grids (benchmarks/README.md:11-67); this makes speculation
        safe to leave on at every batch size. Greedy-equivalent: emitted
        tokens always come from the target posterior, so output matches
        the fixed-depth loop token for token; only accept pacing differs.

        Mechanics: drafting runs an INNER ``lax.while_loop`` over chain
        substeps bounded by ``k_eff`` (real compute savings, not masking);
        proposals at slots >= k_eff are force-rejected in the match mask;
        once the EMA drops below the off threshold after warmup, every
        later round is a bare t=1 target forward (no draft, no capture) —
        asymptotically exactly batched plain decoding."""
        d = self.decoder
        k = d.k
        d2t = jnp.asarray(d._d2t, jnp.int32)
        idx = jnp.arange(k + 1, dtype=jnp.int32)
        rows = jnp.arange(batch, dtype=jnp.int32)
        alpha = self.ADAPT_ALPHA
        off_thresh = self.ADAPT_OFF_THRESH
        warmup = self.ADAPT_WARMUP_ROUNDS

        def propose_dyn(variables, last_dl, hidden, d_ck, d_cv, d_len,
                        k_eff):
            p = jnp.argmax(last_dl, axis=-1).astype(jnp.int32)   # [B]
            toks = jnp.zeros((batch, k), jnp.int32)
            toks = toks.at[:, 0].set(p + jnp.take(d2t, p))

            def cond(st):
                return st[0] < k_eff

            def body(st):
                i, h, ck, cv, clen, toks = st
                prev = jnp.take_along_axis(
                    toks, (i - 1)[None, None].repeat(batch, 0), axis=1
                )                                                # [B, 1]
                h, dlog, ck, cv = self._draft(
                    variables, prev, h, ck, cv, clen
                )
                clen = clen + 1
                dt = jnp.argmax(dlog[:, -1], axis=-1).astype(jnp.int32)
                nxt = dt + jnp.take(d2t, dt)
                toks = jnp.where(
                    jnp.arange(k)[None] == i, nxt[:, None], toks
                )
                return i + 1, h, ck, cv, clen, toks

            st = (
                jnp.asarray(1, jnp.int32), hidden, d_ck, d_cv, d_len, toks,
            )
            st = jax.lax.while_loop(cond, body, st)
            return st[5]                                         # [B, k]

        def loop(target_params, variables, t_ck, t_cv, t_len, d_ck, d_cv,
                 d_len, cur, last_h, last_dl, out_buf, out_cnt, acc_buf,
                 max_new):
            budget = t_ck.shape[3]

            def active_rows(t_len, out_cnt, done):
                return (
                    (~done)
                    & (out_cnt < max_new)
                    & (t_len + k + 1 < budget)
                )

            def cond(carry):
                t_len, out_cnt, done = carry[2], carry[10], carry[13]
                return jnp.any(active_rows(t_len, out_cnt, done))

            def spec_round(op):
                (t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h,
                 last_dl, active, k_eff) = op
                proposals = propose_dyn(
                    variables, last_dl, last_h, d_ck, d_cv, d_len, k_eff
                )
                block = jnp.concatenate(
                    [cur[:, None], proposals], axis=1
                )
                logits, aux, n_tck, n_tcv = target_cached_forward(
                    target_params, d.target_config, block, t_ck, t_cv,
                    t_len, d.capture_layers,
                )
                posterior = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                matches = (
                    (proposals == posterior[:, :k])
                    & (jnp.arange(k)[None] < k_eff)
                ).astype(jnp.int32)
                acc = jnp.sum(jnp.cumprod(matches, axis=1), axis=1)
                bonus = jnp.take_along_axis(
                    posterior, acc[:, None], axis=1
                )[:, 0]
                props_p = jnp.concatenate(
                    [proposals, bonus[:, None]], axis=1
                )
                emitted = jnp.where(
                    idx[None] < acc[:, None], props_p, bonus[:, None]
                )

                hidden_full = self._project(variables, aux)
                h_out, dlog_out, n_dck, n_dcv = self._draft(
                    variables, emitted, hidden_full, d_ck, d_cv, d_len
                )
                n_last_h = jnp.take_along_axis(
                    h_out, acc[:, None, None], axis=1
                )
                n_last_dl = jnp.take_along_axis(
                    dlog_out, acc[:, None, None], axis=1
                )[:, 0]
                return (n_tck, n_tcv, n_dck, n_dcv, n_last_h, n_last_dl,
                        acc, bonus, emitted)

            def plain_round(op):
                (t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h,
                 last_dl, active, k_eff) = op
                logits, _aux, n_tck, n_tcv = target_cached_forward(
                    target_params, d.target_config, cur[:, None], t_ck,
                    t_cv, t_len, (),
                )
                bonus = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                acc = jnp.zeros((batch,), jnp.int32)
                emitted = jnp.concatenate([
                    bonus[:, None],
                    jnp.broadcast_to(bonus[:, None], (batch, k)),
                ], axis=1)
                return (n_tck, n_tcv, d_ck, d_cv, last_h, last_dl,
                        acc, bonus, emitted)

            def body(carry):
                (t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h,
                 last_dl, out_buf, out_cnt, acc_buf, n_rounds, done,
                 k_eff, ema, spec_off) = carry
                active = active_rows(t_len, out_cnt, done)

                op = (t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h,
                      last_dl, active, k_eff)
                (n_tck, n_tcv, n_dck, n_dcv, n_last_h, n_last_dl, acc,
                 bonus, emitted) = jax.lax.cond(
                    spec_off, plain_round, spec_round, op
                )

                pos = out_cnt[:, None] + idx[None]
                old_out = out_buf[rows[:, None], pos]
                out_buf = out_buf.at[rows[:, None], pos].set(
                    jnp.where(active[:, None], emitted, old_out),
                    mode="drop",
                )
                old_acc = acc_buf[rows, n_rounds]
                acc_buf = acc_buf.at[rows, n_rounds].set(
                    jnp.where(active, acc + 1, old_acc), mode="drop"
                )
                hit = _fused_stop_hit_rows(
                    emitted, idx[None] <= acc[:, None], stop_ids
                )

                a1 = active[:, None]
                t_ck = jnp.where(
                    active[None, :, None, None, None], n_tck, t_ck
                )
                t_cv = jnp.where(
                    active[None, :, None, None, None], n_tcv, t_cv
                )
                d_ck = jnp.where(active[:, None, None, None], n_dck, d_ck)
                d_cv = jnp.where(active[:, None, None, None], n_dcv, d_cv)
                last_h = jnp.where(active[:, None, None], n_last_h, last_h)
                last_dl = jnp.where(a1, n_last_dl, last_dl)
                step = jnp.where(active, acc + 1, 0)

                # policy update (spec rounds only): EMA over active rows
                n_active = jnp.maximum(jnp.sum(active.astype(jnp.int32)), 1)
                mean_acc = (
                    jnp.sum(jnp.where(active, acc, 0)).astype(jnp.float32)
                    / n_active
                )
                round_idx = jnp.max(n_rounds)
                was_plain = spec_off      # THIS round's mode (pre-update)
                ema = jnp.where(
                    spec_off, ema, (1 - alpha) * ema + alpha * mean_acc
                )
                k_eff = jnp.clip(
                    jnp.floor(ema + 0.5).astype(jnp.int32) + 1, 1, k
                )
                spec_off = spec_off | (
                    (round_idx >= warmup) & (ema < off_thresh)
                )
                return (
                    t_ck, t_cv, t_len + step, d_ck, d_cv,
                    d_len + jnp.where(was_plain, 0, step),
                    jnp.where(active, bonus, cur), last_h, last_dl,
                    out_buf, out_cnt + step, acc_buf,
                    n_rounds + active.astype(jnp.int32),
                    done | (active & hit), k_eff, ema, spec_off,
                )

            init = (
                t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h, last_dl,
                out_buf, out_cnt, acc_buf,
                jnp.zeros((batch,), jnp.int32),
                jnp.zeros((batch,), bool),
                jnp.asarray(k, jnp.int32),
                jnp.asarray(float(k), jnp.float32),
                jnp.asarray(False),
            )
            final = jax.lax.while_loop(cond, body, init)
            return final[9], final[10], final[11], final[12]

        return loop

    # -- batched beam tree mode --------------------------------------------

    def batch_beam(self, batch: int, m: int, stop_ids: Tuple[int, ...]):
        key = ("batch_beam", batch, m, stop_ids)
        if key not in self._cache:
            self._cache[key] = jax.jit(
                self._build_batch_beam(batch, m, stop_ids)
            )
        return self._cache[key]

    def _build_batch_beam(self, batch: int, m: int,
                          stop_ids: Tuple[int, ...]):
        """EAGLE-2-style beam trees for B rows at once: every row expands
        its own dynamic tree (branching at every depth by cumulative draft
        log-prob on a [B*m] beam axis), the per-row [B, T, T] ancestor
        masks verify all trees in ONE target forward, and each row walks
        its own posterior-matching path. Freezing and per-row cache
        bookkeeping follow ``_build_batch_chain``."""
        d = self.decoder
        k = d.k
        d2t = jnp.asarray(d._d2t, jnp.int32)
        block_t = 1 + k * m
        kidx = jnp.arange(k + 1, dtype=jnp.int32)
        rows = jnp.arange(batch, dtype=jnp.int32)
        depth_pos = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            1 + jnp.repeat(jnp.arange(k, dtype=jnp.int32), m),
        ])

        def expand(variables, last_dl, hidden, d_ck, d_cv, d_len):
            logp = jax.nn.log_softmax(
                last_dl.astype(jnp.float32), axis=-1
            )                                             # [B, Vd]
            val, tok_d = jax.lax.top_k(logp, m)           # [B, m]
            tok_d = tok_d.astype(jnp.int32)
            tokens = [tok_d + jnp.take(d2t, tok_d)]
            parents = [jnp.zeros((batch, m), jnp.int32)]
            cum = val
            h = jnp.repeat(hidden, m, axis=0)             # [B*m, 1, H]
            ck = jnp.repeat(d_ck, m, axis=0)
            cv = jnp.repeat(d_cv, m, axis=0)
            clen = jnp.repeat(d_len, m)
            for _depth in range(1, k):
                h, dlog, ck, cv = self._draft(
                    variables, tokens[-1].reshape(-1)[:, None], h, ck, cv,
                    clen,
                )
                clen = clen + 1
                lp = jax.nn.log_softmax(
                    dlog[:, -1].astype(jnp.float32), axis=-1
                ).reshape(batch, m, -1)
                child_val, child_tok = jax.lax.top_k(lp, m)   # [B, m, m]
                cand = (cum[:, :, None] + child_val).reshape(batch, -1)
                top_val, top_idx = jax.lax.top_k(cand, m)     # [B, m]
                parent = (top_idx // m).astype(jnp.int32)
                tok_d = jnp.take_along_axis(
                    child_tok.reshape(batch, -1), top_idx, axis=1
                ).astype(jnp.int32)
                cum = top_val
                # reorder each row's beam state onto its selected parents
                h = jnp.take_along_axis(
                    h.reshape(batch, m, *h.shape[1:]),
                    parent[:, :, None, None], axis=1,
                ).reshape(batch * m, *h.shape[1:])
                ck = jnp.take_along_axis(
                    ck.reshape(batch, m, *ck.shape[1:]),
                    parent[:, :, None, None, None], axis=1,
                ).reshape(batch * m, *ck.shape[1:])
                cv = jnp.take_along_axis(
                    cv.reshape(batch, m, *cv.shape[1:]),
                    parent[:, :, None, None, None], axis=1,
                ).reshape(batch * m, *cv.shape[1:])
                tokens.append(tok_d + jnp.take(d2t, tok_d))
                parents.append(parent)
            return jnp.stack(tokens, 1), jnp.stack(parents, 1)  # [B, k, m]

        def build_allow_one(parents):
            """[k, m] level-local parent pointers → [T, T] ancestor mask
            (same construction as the bs1 beam loop)."""
            allow = jnp.zeros((block_t, block_t), bool)
            allow = allow.at[:, 0].set(True)
            prev_rows = jnp.zeros((m, block_t), bool)
            for depth in range(k):
                slots = 1 + depth * m + jnp.arange(m)
                base = (
                    prev_rows[parents[depth]] if depth > 0
                    else jnp.zeros((m, block_t), bool)
                )
                rws = base.at[jnp.arange(m), slots].set(True)
                rws = rws.at[:, 0].set(True)
                allow = jax.lax.dynamic_update_slice(
                    allow, rws, (1 + depth * m, 0)
                )
                prev_rows = rws
            return allow

        def accept_walk_one(tokens, parents, post):
            """([k, m], [k, m], [T]) → (acc, path_slots [k], path_tokens
            [k], bonus) — same walk as the bs1 beam loop."""
            cur_slot = jnp.asarray(0, jnp.int32)
            alive = jnp.asarray(True)
            acc = jnp.asarray(0, jnp.int32)
            path_slots = jnp.zeros((k,), jnp.int32)
            path_tokens = jnp.zeros((k,), jnp.int32)
            for depth in range(k):
                want = post[cur_slot]
                if depth == 0:
                    ok = tokens[0] == want
                else:
                    parent_local = (cur_slot - 1) - (depth - 1) * m
                    ok = (
                        (parents[depth] == parent_local)
                        & (tokens[depth] == want)
                    )
                hit = alive & jnp.any(ok)
                child = jnp.argmax(ok).astype(jnp.int32)
                slot = 1 + depth * m + child
                cur_slot = jnp.where(hit, slot, cur_slot)
                acc = acc + hit.astype(jnp.int32)
                path_slots = path_slots.at[depth].set(
                    jnp.where(hit, slot, 0)
                )
                path_tokens = path_tokens.at[depth].set(
                    jnp.where(hit, want, 0)
                )
                alive = hit
            bonus = post[cur_slot]
            return acc, path_slots, path_tokens, bonus

        def loop(target_params, variables, t_ck, t_cv, t_len, d_ck, d_cv,
                 d_len, cur, last_h, last_dl, out_buf, out_cnt, acc_buf,
                 max_new):
            budget = t_ck.shape[3]

            def active_rows(t_len, out_cnt, done):
                return (
                    (~done)
                    & (out_cnt < max_new)
                    & (t_len + block_t < budget)
                )

            def cond(carry):
                t_len, out_cnt, done = carry[2], carry[10], carry[13]
                return jnp.any(active_rows(t_len, out_cnt, done))

            def body(carry):
                (t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h,
                 last_dl, out_buf, out_cnt, acc_buf, n_rounds, done) = carry
                active = active_rows(t_len, out_cnt, done)

                tokens, parents = expand(
                    variables, last_dl, last_h, d_ck, d_cv, d_len
                )                                            # [B, k, m]
                allow = jax.vmap(build_allow_one)(parents)   # [B, T, T]
                block = jnp.concatenate(
                    [cur[:, None], tokens.reshape(batch, -1)], axis=1
                )
                logits, aux, n_tck, n_tcv = target_cached_forward(
                    target_params, d.target_config, block, t_ck, t_cv,
                    t_len, d.capture_layers,
                    block_allow=allow, block_positions=depth_pos,
                )
                post = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                acc, path_slots, path_tokens, bonus = jax.vmap(
                    accept_walk_one
                )(tokens, parents, post)
                path_p = jnp.concatenate(
                    [path_tokens, bonus[:, None]], axis=1
                )
                emitted = jnp.where(
                    kidx[None] < acc[:, None], path_p, bonus[:, None]
                )                                            # [B, k+1]

                pos = out_cnt[:, None] + kidx[None]
                old_out = out_buf[rows[:, None], pos]
                out_buf = out_buf.at[rows[:, None], pos].set(
                    jnp.where(active[:, None], emitted, old_out),
                    mode="drop",
                )
                old_acc = acc_buf[rows, n_rounds]
                acc_buf = acc_buf.at[rows, n_rounds].set(
                    jnp.where(active, acc + 1, old_acc), mode="drop"
                )

                # per-row compaction of the accepted path in ONE
                # gather+scatter (rejected depths land past the new length)
                src_idx = t_len[:, None] + path_slots          # [B, k]
                dst_idx = t_len[:, None] + 1 + jnp.arange(k)[None]
                n_tck = _gather_scatter_cache_rows(n_tck, src_idx, dst_idx)
                n_tcv = _gather_scatter_cache_rows(n_tcv, src_idx, dst_idx)

                slots = jnp.concatenate(
                    [jnp.zeros((batch, 1), jnp.int32), path_slots], axis=1
                )
                aux_sel = jnp.take_along_axis(
                    aux, slots[:, :, None], axis=1
                )
                hidden_full = self._project(variables, aux_sel)
                h_out, dlog_out, n_dck, n_dcv = self._draft(
                    variables, emitted, hidden_full, d_ck, d_cv, d_len
                )
                n_last_h = jnp.take_along_axis(
                    h_out, acc[:, None, None], axis=1
                )
                n_last_dl = jnp.take_along_axis(
                    dlog_out, acc[:, None, None], axis=1
                )[:, 0]
                hit = _fused_stop_hit_rows(
                    emitted, kidx[None] <= acc[:, None], stop_ids
                )

                a1 = active[:, None]
                t_ck = jnp.where(
                    active[None, :, None, None, None], n_tck, t_ck
                )
                t_cv = jnp.where(
                    active[None, :, None, None, None], n_tcv, t_cv
                )
                d_ck = jnp.where(active[:, None, None, None], n_dck, d_ck)
                d_cv = jnp.where(active[:, None, None, None], n_dcv, d_cv)
                last_h = jnp.where(active[:, None, None], n_last_h, last_h)
                last_dl = jnp.where(a1, n_last_dl, last_dl)
                step = jnp.where(active, acc + 1, 0)
                return (
                    t_ck, t_cv, t_len + step, d_ck, d_cv, d_len + step,
                    jnp.where(active, bonus, cur), last_h, last_dl,
                    out_buf, out_cnt + step, acc_buf,
                    n_rounds + active.astype(jnp.int32),
                    done | (active & hit),
                )

            init = (
                t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h, last_dl,
                out_buf, out_cnt, acc_buf,
                jnp.zeros((batch,), jnp.int32),
                jnp.zeros((batch,), bool),
            )
            final = jax.lax.while_loop(cond, body, init)
            return final[9], final[10], final[11], final[12]

        return loop

    # -- batched tree mode -------------------------------------------------

    def batch_tree(self, batch: int, topk: int, stop_ids: Tuple[int, ...]):
        key = ("batch_tree", batch, topk, stop_ids)
        if key not in self._cache:
            self._cache[key] = jax.jit(
                self._build_batch_tree(batch, topk, stop_ids)
            )
        return self._cache[key]

    def _build_batch_tree(self, batch: int, topk: int,
                          stop_ids: Tuple[int, ...]):
        """Root-branching tree speculation for B rows at once: each row
        drafts ``topk`` greedy chains (drafted together on a [B*topk] batch
        axis), ONE per-row tree-masked target forward verifies every row's
        whole tree, each row keeps its own winning chain, and per-row
        compaction moves the winner onto canonical cache slots. Rows
        freeze independently, exactly like ``_build_batch_chain``."""
        d = self.decoder
        k = d.k
        d2t = jnp.asarray(d._d2t, jnp.int32)
        block_allow, block_pos = d._tree_layout(topk)
        block_t = 1 + topk * k
        idx = jnp.arange(k + 1, dtype=jnp.int32)
        rows = jnp.arange(batch, dtype=jnp.int32)

        def propose(variables, last_dl, hidden, d_ck, d_cv, d_len):
            _v, first = jax.lax.top_k(last_dl, topk)        # [B, topk]
            first = first.astype(jnp.int32)
            cols = [first + jnp.take(d2t, first)]
            h = jnp.repeat(hidden, topk, axis=0)            # [B*topk, 1, H]
            ck = jnp.repeat(d_ck, topk, axis=0)
            cv = jnp.repeat(d_cv, topk, axis=0)
            clen = jnp.repeat(d_len, topk)                  # [B*topk]
            for _ in range(k - 1):
                ids = cols[-1].reshape(-1)[:, None]
                h, dlog, ck, cv = self._draft(
                    variables, ids, h, ck, cv, clen
                )
                clen = clen + 1
                dts = jnp.argmax(dlog[:, -1], axis=-1).astype(jnp.int32)
                dts = dts.reshape(batch, topk)
                cols.append(dts + jnp.take(d2t, dts))
            return jnp.stack(cols, axis=2)                  # [B, topk, k]

        def loop(target_params, variables, t_ck, t_cv, t_len, d_ck, d_cv,
                 d_len, cur, last_h, last_dl, out_buf, out_cnt, acc_buf,
                 max_new):
            budget = t_ck.shape[3]

            def active_rows(t_len, out_cnt, done):
                return (
                    (~done)
                    & (out_cnt < max_new)
                    & (t_len + block_t < budget)
                )

            def cond(carry):
                t_len, out_cnt, done = carry[2], carry[10], carry[13]
                return jnp.any(active_rows(t_len, out_cnt, done))

            def body(carry):
                (t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h,
                 last_dl, out_buf, out_cnt, acc_buf, n_rounds, done) = carry
                active = active_rows(t_len, out_cnt, done)   # [B]

                chains = propose(
                    variables, last_dl, last_h, d_ck, d_cv, d_len
                )                                            # [B, topk, k]
                block = jnp.concatenate(
                    [cur[:, None], chains.reshape(batch, -1)], axis=1
                )
                logits, aux, n_tck, n_tcv = target_cached_forward(
                    target_params, d.target_config, block, t_ck, t_cv,
                    t_len, d.capture_layers,
                    block_allow=block_allow, block_positions=block_pos,
                )
                post = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                preds = jnp.concatenate(
                    [
                        jnp.broadcast_to(
                            post[:, :1, None], (batch, topk, 1)
                        ),
                        post[:, 1:].reshape(batch, topk, k)[:, :, : k - 1],
                    ],
                    axis=2,
                )                                            # [B, topk, k]
                matches = (chains == preds).astype(jnp.int32)
                accs = jnp.sum(jnp.cumprod(matches, axis=2), axis=2)
                best_c = jnp.argmax(accs, axis=1).astype(jnp.int32)  # [B]
                acc = jnp.take_along_axis(
                    accs, best_c[:, None], axis=1
                )[:, 0]
                bonus_slot = jnp.where(
                    acc == 0, 0, 1 + best_c * k + acc - 1
                )
                bonus = jnp.take_along_axis(
                    post, bonus_slot[:, None], axis=1
                )[:, 0]
                chain_best = jnp.take_along_axis(
                    chains, best_c[:, None, None], axis=1
                )[:, 0]                                      # [B, k]
                chain_p = jnp.concatenate(
                    [chain_best, bonus[:, None]], axis=1
                )
                emitted = jnp.where(
                    idx[None] < acc[:, None], chain_p, bonus[:, None]
                )                                            # [B, k+1]

                pos = out_cnt[:, None] + idx[None]
                old_out = out_buf[rows[:, None], pos]
                out_buf = out_buf.at[rows[:, None], pos].set(
                    jnp.where(active[:, None], emitted, old_out),
                    mode="drop",
                )
                old_acc = acc_buf[rows, n_rounds]
                acc_buf = acc_buf.at[rows, n_rounds].set(
                    jnp.where(active, acc + 1, old_acc), mode="drop"
                )

                # per-row compaction of the winner's k slots onto the
                # canonical positions (identity when best_c == 0)
                src = t_len + 1 + best_c * k
                dst = t_len + 1
                n_tck = _move_cache_rows_batched(n_tck, src, dst, k)
                n_tcv = _move_cache_rows_batched(n_tcv, src, dst, k)

                # draft re-extension over slot 0 + the winner's k slots
                slots = jnp.concatenate([
                    jnp.zeros((batch, 1), jnp.int32),
                    1 + best_c[:, None] * k + jnp.arange(k)[None],
                ], axis=1)                                   # [B, k+1]
                aux_sel = jnp.take_along_axis(
                    aux, slots[:, :, None], axis=1
                )
                hidden_full = self._project(variables, aux_sel)
                h_out, dlog_out, n_dck, n_dcv = self._draft(
                    variables, emitted, hidden_full, d_ck, d_cv, d_len
                )
                n_last_h = jnp.take_along_axis(
                    h_out, acc[:, None, None], axis=1
                )
                n_last_dl = jnp.take_along_axis(
                    dlog_out, acc[:, None, None], axis=1
                )[:, 0]
                hit = _fused_stop_hit_rows(
                    emitted, idx[None] <= acc[:, None], stop_ids
                )

                a1 = active[:, None]
                t_ck = jnp.where(
                    active[None, :, None, None, None], n_tck, t_ck
                )
                t_cv = jnp.where(
                    active[None, :, None, None, None], n_tcv, t_cv
                )
                d_ck = jnp.where(active[:, None, None, None], n_dck, d_ck)
                d_cv = jnp.where(active[:, None, None, None], n_dcv, d_cv)
                last_h = jnp.where(active[:, None, None], n_last_h, last_h)
                last_dl = jnp.where(a1, n_last_dl, last_dl)
                step = jnp.where(active, acc + 1, 0)
                return (
                    t_ck, t_cv, t_len + step, d_ck, d_cv, d_len + step,
                    jnp.where(active, bonus, cur), last_h, last_dl,
                    out_buf, out_cnt + step, acc_buf,
                    n_rounds + active.astype(jnp.int32),
                    done | (active & hit),
                )

            init = (
                t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h, last_dl,
                out_buf, out_cnt, acc_buf,
                jnp.zeros((batch,), jnp.int32),
                jnp.zeros((batch,), bool),
            )
            final = jax.lax.while_loop(cond, body, init)
            return final[9], final[10], final[11], final[12]

        return loop

    # -- tree mode ---------------------------------------------------------

    def _build_tree(self, topk: int, stop_ids: Tuple[int, ...]):
        d = self.decoder
        k = d.k
        d2t = jnp.asarray(d._d2t, jnp.int32)
        block_allow, block_pos = d._tree_layout(topk)
        block_t = 1 + topk * k
        idx = jnp.arange(k + 1, dtype=jnp.int32)

        def propose_chains(variables, first_dl, hidden, d_ck, d_cv, d_len):
            _vals, first = jax.lax.top_k(first_dl[0], topk)
            first = first.astype(jnp.int32)
            cols = [first + jnp.take(d2t, first)]          # [topk]
            h = jnp.broadcast_to(hidden, (topk,) + hidden.shape[1:])
            ck = jnp.broadcast_to(d_ck, (topk,) + d_ck.shape[1:])
            cv = jnp.broadcast_to(d_cv, (topk,) + d_cv.shape[1:])
            clen = d_len
            for _ in range(k - 1):
                h, dlog, ck, cv = self._draft(variables, cols[-1][:, None],
                                              h, ck, cv, clen)
                clen = clen + 1
                dts = jnp.argmax(dlog[:, -1], axis=-1).astype(jnp.int32)
                cols.append(dts + jnp.take(d2t, dts))
            return jnp.stack(cols, axis=1)                  # [topk, k]

        def loop(target_params, variables, t_ck, t_cv, t_len, d_ck, d_cv,
                 d_len, cur, last_h, last_dl, out_buf, out_cnt, acc_buf,
                 max_new):
            budget = t_ck.shape[3]

            def cond(carry):
                (_tck, _tcv, t_len, *_rest, out_cnt, _accb, n_rounds,
                 done) = carry
                return (
                    (~done)
                    & (out_cnt < max_new)
                    & (t_len + block_t < budget)
                )

            def body(carry):
                (t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h, last_dl,
                 out_buf, out_cnt, acc_buf, n_rounds, done) = carry
                chains = propose_chains(variables, last_dl, last_h, d_ck,
                                        d_cv, d_len)
                block = jnp.concatenate(
                    [cur[None], chains.reshape(-1)]
                )[None]
                base_len = t_len
                logits, aux, t_ck, t_cv = target_cached_forward(
                    target_params, d.target_config, block, t_ck, t_cv,
                    base_len, d.capture_layers,
                    block_allow=block_allow, block_positions=block_pos,
                )
                post = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
                # per-chain accepted length: chain token j must match the
                # posterior of its predecessor node (slot 0 for j=0)
                preds = jnp.concatenate(
                    [
                        jnp.broadcast_to(post[0], (topk, 1)),
                        post[1:].reshape(topk, k)[:, : k - 1],
                    ],
                    axis=1,
                )                                           # [topk, k]
                matches = (chains == preds).astype(jnp.int32)
                accs = jnp.sum(jnp.cumprod(matches, axis=1), axis=1)
                best_c = jnp.argmax(accs).astype(jnp.int32)  # first max
                acc = accs[best_c]
                bonus = jnp.where(
                    acc == 0, post[0], post[1 + best_c * k + acc - 1]
                )
                chain_p = jnp.concatenate(
                    [chains[best_c], bonus[None]]
                )
                emitted = jnp.where(idx < acc, chain_p, bonus)

                out_buf = jax.lax.dynamic_update_slice(
                    out_buf, emitted, (out_cnt,)
                )
                acc_buf = jax.lax.dynamic_update_slice(
                    acc_buf, (acc + 1)[None], (n_rounds,)
                )

                # compact the winner's slots onto the canonical positions —
                # k rows moved unconditionally (dynamic start, static size);
                # rows beyond acc land past the new length and are
                # overwritten before they become attendable
                src = base_len + 1 + best_c * k
                dst = base_len + 1
                t_ck = _move_cache_rows(t_ck, src, dst, k)
                t_cv = _move_cache_rows(t_cv, src, dst, k)

                # draft re-extension over slot 0 + the winner's k slots
                slots = jnp.concatenate([
                    jnp.zeros((1,), jnp.int32),
                    1 + best_c * k + jnp.arange(k, dtype=jnp.int32),
                ])
                aux_sel = jnp.take(aux, slots, axis=1)
                hidden_full = self._project(variables, aux_sel)
                h_out, dlog_out, d_ck, d_cv = self._draft(
                    variables, emitted[None], hidden_full, d_ck, d_cv, d_len
                )
                last_h = jax.lax.dynamic_slice(
                    h_out, (0, acc, 0), (1, 1, h_out.shape[2])
                )
                last_dl = jax.lax.dynamic_slice(
                    dlog_out, (0, acc, 0), (1, 1, dlog_out.shape[2])
                )[:, 0]
                done = _fused_stop_hit(emitted, idx <= acc, stop_ids)
                return (
                    t_ck, t_cv, base_len + acc + 1, d_ck, d_cv,
                    d_len + acc + 1, bonus, last_h, last_dl, out_buf,
                    out_cnt + acc + 1, acc_buf, n_rounds + 1, done,
                )

            init = (
                t_ck, t_cv, t_len, d_ck, d_cv, d_len, cur, last_h, last_dl,
                out_buf, out_cnt, acc_buf, jnp.asarray(0, jnp.int32),
                jnp.asarray(False),
            )
            final = jax.lax.while_loop(cond, body, init)
            return final[9], final[10], final[11], final[12]

        return loop


def fused_plain_decode(
    target_params, target_config: TargetConfig, prompt_ids,
    max_new_tokens: int, max_len: int = 512,
    stop_token_ids: Optional[Sequence[int]] = None,
    _loop_cache: Dict[Any, Any] = {},
) -> np.ndarray:
    """Plain greedy decode with the whole token loop in ONE jitted program —
    the wall-clock baseline speculative decoding must beat. Token-for-token
    equal to ``greedy_target_decode`` (tested)."""
    stop_ids = tuple(sorted(set(int(s) for s in (stop_token_ids or ()))))
    ids = np.asarray(prompt_ids, np.int64)[None]
    state = init_target_state(target_config, 1, max_len)
    logits, _aux, ck, cv = target_cached_forward(
        target_params, target_config, jnp.asarray(ids, jnp.int32),
        state.cache_k, state.cache_v, jnp.asarray(0, jnp.int32), (),
    )
    first = jnp.argmax(logits[0, -1]).astype(jnp.int32)

    key = (target_config, stop_ids)
    loop = _loop_cache.get(key)
    if loop is None:
        def _loop(params, ck, cv, t_len, tok, out_buf, max_new):
            budget = ck.shape[3]

            def cond(carry):
                _ck, _cv, t_len, _tok, _buf, cnt, done = carry
                # same cache-budget guard as the batched loop: without it,
                # prompt_len + max_new_tokens > max_len silently overwrites
                # the cache tail (clamped dynamic_update_slice) instead of
                # stopping, breaking row parity with the batched path
                return (~done) & (cnt < max_new) & (t_len + 1 < budget)

            def body(carry):
                ck, cv, t_len, tok, out_buf, cnt, done = carry
                logits, _aux, ck, cv = target_cached_forward(
                    params, target_config, tok[None, None], ck, cv,
                    t_len, (),
                )
                nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
                out_buf = jax.lax.dynamic_update_slice(
                    out_buf, nxt[None], (cnt,)
                )
                done = _fused_stop_hit(
                    nxt[None], jnp.ones((1,), bool), stop_ids
                )
                return ck, cv, t_len + 1, nxt, out_buf, cnt + 1, done

            hit0 = _fused_stop_hit(tok[None], jnp.ones((1,), bool), stop_ids)
            init = (ck, cv, t_len, tok, out_buf,
                    jnp.asarray(1, jnp.int32), hit0)
            final = jax.lax.while_loop(cond, body, init)
            return final[4], final[5]

        loop = jax.jit(_loop)
        _loop_cache[key] = loop

    out_buf = jnp.zeros((max_len + 1,), jnp.int32)
    out_buf = out_buf.at[0].set(first)
    buf, cnt = loop(
        target_params, ck, cv, jnp.asarray(ids.shape[1], jnp.int32), first,
        out_buf, jnp.asarray(max_new_tokens, jnp.int32),
    )
    cnt = int(cnt)
    return np.concatenate([np.asarray(prompt_ids), np.asarray(buf)[:cnt]])


def fused_plain_decode_batched(
    target_params, target_config: TargetConfig, prompts,
    max_new_tokens: int, max_len: int = 512,
    stop_token_ids: Optional[Sequence[int]] = None,
    _loop_cache: Dict[Any, Any] = {},
) -> List[np.ndarray]:
    """Plain greedy decode for a BATCH of prompts in one fused program —
    the like-for-like baseline for ``generate_batch_fused`` (bs > 1
    speculative cells must be compared against batched plain decoding, not
    the bs1 baseline, or the ratio conflates batching with speculation).

    Rows are right-padded (slot == position); each row decodes from its own
    length with per-row cache lengths, finished rows freeze. Row i's output
    equals ``fused_plain_decode`` on prompt i (parity-tested)."""
    stop_ids = tuple(sorted(set(int(s) for s in (stop_token_ids or ()))))
    batch = len(prompts)
    lens = np.asarray([len(p) for p in prompts], np.int32)
    p_max = int(lens.max())
    padded = np.zeros((batch, p_max), np.int64)
    for i, p in enumerate(prompts):
        padded[i, : len(p)] = p

    state = init_target_state(target_config, batch, max_len)
    logits, _aux, ck, cv = target_cached_forward(
        target_params, target_config, jnp.asarray(padded, jnp.int32),
        state.cache_k, state.cache_v, jnp.asarray(0, jnp.int32), (),
    )
    lens_d = jnp.asarray(lens)
    first = jnp.take_along_axis(
        jnp.argmax(logits, axis=-1).astype(jnp.int32),
        lens_d[:, None] - 1, axis=1,
    )[:, 0]                                              # [B]

    key = (target_config, stop_ids, batch)
    loop = _loop_cache.get(key)
    if loop is None:
        def _loop(params, ck, cv, t_len, tok, out_buf, out_cnt, max_new):
            budget = ck.shape[3]

            def cond(carry):
                _ck, _cv, t_len, _tok, _buf, cnt, done = carry
                live = (~done) & (cnt < max_new) & (t_len + 1 < budget)
                return jnp.any(live)

            def body(carry):
                ck, cv, t_len, tok, out_buf, cnt, done = carry
                logits, _aux, ck, cv = target_cached_forward(
                    params, target_config, tok[:, None], ck, cv,
                    t_len, (),
                )
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                live = (~done) & (cnt < max_new) & (t_len + 1 < budget)
                nxt = jnp.where(live, nxt, tok)
                out_buf = jnp.where(
                    live[:, None]
                    & (jnp.arange(out_buf.shape[1])[None] == cnt[:, None]),
                    nxt[:, None], out_buf,
                )
                hit = _fused_stop_hit_rows(
                    nxt[:, None], live[:, None], stop_ids
                )
                return (ck, cv, t_len + live.astype(jnp.int32), nxt,
                        out_buf, cnt + live.astype(jnp.int32), done | hit)

            hit0 = _fused_stop_hit_rows(
                tok[:, None], jnp.ones((tok.shape[0], 1), bool), stop_ids
            )
            final = jax.lax.while_loop(
                cond, body, (ck, cv, t_len, tok, out_buf, out_cnt, hit0)
            )
            return final[4], final[5]

        loop = jax.jit(_loop)
        _loop_cache[key] = loop

    out_buf = jnp.zeros((batch, max_len + 1), jnp.int32)
    out_buf = out_buf.at[:, 0].set(first)
    buf, cnt = loop(
        target_params, ck, cv, lens_d, first, out_buf,
        jnp.ones((batch,), jnp.int32),
        jnp.asarray(max_new_tokens, jnp.int32),
    )
    buf = np.asarray(buf)
    cnt = np.asarray(cnt)
    return [
        np.concatenate([np.asarray(p, np.int64), buf[i, : cnt[i]]])
        for i, p in enumerate(prompts)
    ]


def greedy_target_decode(
    target_params, target_config: TargetConfig, prompt_ids, max_new_tokens,
    capture_layers=(0,), max_len: int = 512,
    stop_token_ids: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Plain greedy decode — the correctness oracle for spec decoding."""
    stop = set(stop_token_ids or ())
    state = init_target_state(target_config, 1, max_len)
    ids = np.asarray(prompt_ids, np.int64)[None]
    logits, _aux, ck, cv = target_cached_forward(
        target_params, target_config, jnp.asarray(ids, jnp.int32),
        state.cache_k, state.cache_v, jnp.asarray(0, jnp.int32),
        tuple(capture_layers),
    )
    state = TargetState(cache_k=ck, cache_v=cv, length=ids.shape[1])
    out = list(prompt_ids)
    tok = int(np.asarray(logits)[0, -1].argmax())
    out.append(tok)
    for _ in range(max_new_tokens - 1):
        if tok in stop:
            break
        logits, _aux, ck, cv = target_cached_forward(
            target_params, target_config, jnp.asarray([[tok]], jnp.int32),
            state.cache_k, state.cache_v, jnp.asarray(state.length, jnp.int32),
            tuple(capture_layers),
        )
        state = TargetState(cache_k=ck, cache_v=cv, length=state.length + 1)
        tok = int(np.asarray(logits)[0, -1].argmax())
        out.append(tok)
    return np.asarray(out)


# --------------------------------------------------------------------------
# DFlash block speculative decoding
# --------------------------------------------------------------------------

class DFlashSpecDecoder:
    """Block-diffusion speculative decoding (reference
    DFlashDraftModel.spec_generate, dflash.py:462-575): the draft predicts a
    whole block of ``block_size - 1`` tokens in ONE forward (mask tokens
    cross-attending to the target's captured features), the target verifies
    the block, the accepted prefix's fresh features extend the context.

    Greedy; batch 1. The draft forward reuses the training-time anchor-block
    attention with a single anchor at the block start, so inference exercises
    exactly the trained code path.
    """

    def __init__(
        self,
        target_params,
        target_config: TargetConfig,
        draft_module,                 # DFlashDraftModel (or Domino/DSpark)
        draft_variables,
        *,
        max_len: int = 512,
        mesh=None,
    ) -> None:
        # pin to device once — see Eagle3SpecDecoder.__init__ (host-numpy
        # jit arguments re-upload per dispatch); ``mesh`` shards the target
        # over the fsdp axis for bigger-than-HBM serving
        if mesh is not None:
            from specforge_tpu.parallel.mesh import shard_pytree_like_params

            self.target_params = shard_pytree_like_params(
                target_params, mesh
            )
        else:
            self.target_params = jax.device_put(target_params)
        self.mesh = mesh
        self.target_config = target_config
        self.draft = draft_module
        self.draft_variables = jax.device_put(draft_variables)
        self.capture_layers = tuple(
            draft_module.config.resolved_target_layer_ids
        )
        self.block_size = draft_module.config.block_size
        self.mask_token_id = draft_module.config.mask_token_id or 0
        self.max_len = max_len
        self._embed = self.target_params["model.embed_tokens.weight"]
        self._lm_head = self.target_params["lm_head.weight"]
        # host copies for the eager (host-loop) paths, fetched lazily and
        # ONCE: np.asarray on the pinned device tree inside the per-round
        # loop would re-transfer the full embedding table every speculation
        # round (~262 MB at 32k x 2048; a cross-device gather under mesh=)
        self._embed_host: Optional[np.ndarray] = None

        def draft_forward(variables, noise_emb, ctx, ctx_pos, draft_pos,
                          anchors, keep):
            return draft_module.apply(
                variables, noise_emb, ctx, ctx_pos, draft_pos, anchors, keep
            )

        self._draft_forward = jax.jit(draft_forward)
        self._projector = draft_module.config.projector_type or "dflash"

        def head_forward(variables, base4, hidden4, prev_emb, prev_ids):
            return draft_module.apply(
                variables, base4,
                prev_token_ids=prev_ids,
                prev_token_embeddings=prev_emb,
                hidden_states=hidden4,
                method="apply_logits_head",
            )

        self._head_forward = jax.jit(head_forward)

    def _embed_np(self) -> np.ndarray:
        if self._embed_host is None:
            self._embed_host = np.asarray(self._embed, np.float32)
        return self._embed_host

    def _propose(self, draft_hidden, block_ids: np.ndarray) -> list:
        """Greedy block proposals (bs-1 tokens) with the family's auxiliary
        logits head applied CAUSALLY within the block — domino feeds the
        GRU the embeddings of already-committed tokens, dspark feeds the
        Markov head the previous sampled id (reference
        Domino._sample_draft_tokens / MarkovHead.sample_block_tokens);
        plain DFlash takes one argmax over the base logits."""
        bs = self.block_size
        lm = jnp.asarray(self._lm_head, jnp.float32)
        base = np.asarray(jnp.einsum(
            "bsh,vh->bsv", draft_hidden.astype(jnp.float32), lm
        ))                                            # [1, bs, V]
        if self._projector == "dflash":
            if self.draft.config.shift_label:
                # position j predicts token j+1: tokens 1..bs-1 come from
                # positions 0..bs-2
                return base[0, :-1].argmax(axis=-1).tolist()
            return base[0, 1:].argmax(axis=-1).tolist()

        if self._projector == "domino":
            shift = self.draft.config.shift_label
            completed = np.asarray(block_ids, np.int64).copy()  # [1, bs]
            hidden4 = draft_hidden[:, None]                     # [1,1,bs,h]
            base4 = jnp.asarray(base[:, None])
            embed = self._embed_np()
            for pos in range(1, bs):
                prev_emb = jnp.asarray(
                    embed[completed][:, None], jnp.float32
                )                                               # [1,1,bs,e]
                final = np.asarray(self._head_forward(
                    self.draft_variables, base4, hidden4, prev_emb, None
                ))
                head_pos = pos - 1 if shift else pos
                completed[0, pos] = int(final[0, 0, head_pos].argmax())
            return completed[0, 1:].tolist()

        # dspark is ALWAYS shift-labeled (OnlineDSparkModel._labels_and_mask
        # gathers offsets 1..block_size): block position p is trained to
        # predict token anchor+1+p with prev id = the token at anchor+p. So
        # proposal j (token anchor+j) reads position j-1 with prev = the
        # previously sampled token; heads are causal in prev ids, so
        # iterative refill is exact.
        prev_ids = np.zeros((1, 1, bs), np.int64)
        hidden4 = draft_hidden[:, None]
        base4 = jnp.asarray(base[:, None])
        out = []
        for j in range(1, bs):
            pos = j - 1
            prev_ids[0, 0, pos] = (
                out[-1] if out else int(block_ids[0, 0])
            )
            final = np.asarray(self._head_forward(
                self.draft_variables, base4, hidden4, None,
                jnp.asarray(prev_ids),
            ))
            out.append(int(final[0, 0, pos].argmax()))
        return out

    def _target_forward(self, ids: np.ndarray, state: TargetState):
        logits, aux, ck, cv = target_cached_forward(
            self.target_params, self.target_config,
            jnp.asarray(ids, jnp.int32),
            state.cache_k, state.cache_v,
            jnp.asarray(state.length, jnp.int32),
            self.capture_layers,
        )
        new_state = TargetState(
            cache_k=ck, cache_v=cv, length=state.length + ids.shape[1]
        )
        return np.asarray(logits), np.asarray(aux, np.float32), new_state

    def generate(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: int,
        stop_token_ids: Optional[Sequence[int]] = None,
    ) -> SpecDecodeResult:
        stop = set(stop_token_ids or ())
        bs = self.block_size
        prompt = np.asarray(prompt_ids, np.int64)[None]
        p_len = prompt.shape[1]
        n_capture = len(self.capture_layers)
        h = self.target_config.hidden_size

        t_state = init_target_state(self.target_config, 1, self.max_len)
        # context features for positions seen by the target so far
        ctx_features = np.zeros(
            (1, self.max_len, n_capture * h), np.float32
        )

        logits, aux, t_state = self._target_forward(prompt, t_state)
        ctx_features[:, :p_len] = aux
        cur_token = int(logits[0, -1].argmax())
        output = list(prompt_ids) + [cur_token]

        accept_lengths: List[int] = []
        steps = 0
        start = p_len  # global position of the current block's first token
        while (
            len(output) - p_len < max_new_tokens
            and start + bs < self.max_len
        ):
            steps += 1
            # --- draft: one block forward ---
            block_ids = np.full((1, bs), self.mask_token_id, np.int64)
            block_ids[0, 0] = cur_token
            noise_emb = self._embed_np()[block_ids[0]][None]
            ctx = ctx_features[:, :start]
            ctx_pos = np.arange(start, dtype=np.int32)[None]
            draft_pos = (start + np.arange(bs, dtype=np.int32))[None]
            anchors = np.asarray([[start]], np.int32)
            keep = np.ones((1, 1), bool)
            draft_hidden = self._draft_forward(
                self.draft_variables, jnp.asarray(noise_emb, jnp.bfloat16),
                jnp.asarray(ctx, jnp.bfloat16), jnp.asarray(ctx_pos),
                jnp.asarray(draft_pos), jnp.asarray(anchors),
                jnp.asarray(keep),
            )
            # bs-1 proposals with the family head applied causally (domino
            # GRU / dspark Markov) and shift_label-aware position selection
            proposals = self._propose(draft_hidden, block_ids)

            # --- target verification over the whole block ---
            block = np.asarray([[cur_token, *proposals]], np.int64)
            logits, aux, t_state = self._target_forward(block, t_state)
            posterior = logits[0].argmax(axis=-1)
            accepted = 0
            for j in range(bs - 1):
                if proposals[j] == int(posterior[j]):
                    accepted += 1
                else:
                    break
            emitted = [*proposals[:accepted], int(posterior[accepted])]
            output.extend(emitted)
            accept_lengths.append(accepted + 1)

            # roll target cache back; accepted positions' features extend ctx
            t_state = TargetState(
                cache_k=t_state.cache_k, cache_v=t_state.cache_v,
                length=t_state.length - bs + accepted + 1,
            )
            ctx_features[:, start: start + accepted + 1] = (
                aux[:, : accepted + 1]
            )
            start += accepted + 1
            cur_token = int(posterior[accepted])
            if stop & set(emitted):
                break
        return SpecDecodeResult(
            output_ids=np.asarray(output),
            accept_lengths=accept_lengths,
            steps=steps,
        )

    # -- fused whole-generate loop ------------------------------------------
    #
    # The host loop above slices ``ctx_features[:, :start]`` — a NEW shape
    # every round, so XLA recompiles the draft forward per distinct context
    # length, and the family heads sync bs-1 argmaxes to the host per block.
    # The fused loop feeds the FULL fixed-size context buffer every round:
    # the DFlash mask rule is index-based (``ctx_idx < anchor``,
    # ops/masks.py:126), so slots at or beyond the anchor are exactly masked
    # and garbage there is overwritten before any later anchor can expose it.
    # One compilation, one dispatch per generate.

    def _build_fused(self, stop_ids: Tuple[int, ...]):
        bs = self.block_size
        n_cap = len(self.capture_layers)
        projector = self._projector
        shift = bool(getattr(self.draft.config, "shift_label", False))
        idx = jnp.arange(bs, dtype=jnp.int32)

        def draft_fwd(variables, noise, ctx, ctx_pos, draft_pos, anchors,
                      keep):
            return self.draft.apply(
                variables, noise, ctx, ctx_pos, draft_pos, anchors, keep
            )

        def head_fwd(variables, base4, hidden4, prev_emb, prev_ids):
            return self.draft.apply(
                variables, base4, prev_token_ids=prev_ids,
                prev_token_embeddings=prev_emb, hidden_states=hidden4,
                method="apply_logits_head",
            )

        def propose(variables, embed, lm_head, draft_hidden, cur):
            base = jnp.einsum(
                "bsh,vh->bsv", draft_hidden.astype(jnp.float32),
                lm_head.astype(jnp.float32),
            )                                               # [1, bs, V]
            if projector == "dflash":
                sel = base[0, :-1] if shift else base[0, 1:]
                return jnp.argmax(sel, axis=-1).astype(jnp.int32)

            hidden4 = draft_hidden[:, None]
            base4 = base[:, None]
            if projector == "domino":
                completed = jnp.full((1, bs), self.mask_token_id, jnp.int32)
                completed = completed.at[0, 0].set(cur)
                for pos in range(1, bs):
                    prev_emb = jnp.take(
                        embed.astype(jnp.float32), completed, axis=0
                    )[:, None]                              # [1, 1, bs, e]
                    final = head_fwd(variables, base4, hidden4, prev_emb,
                                     None)
                    head_pos = pos - 1 if shift else pos
                    completed = completed.at[0, pos].set(
                        jnp.argmax(final[0, 0, head_pos]).astype(jnp.int32)
                    )
                return completed[0, 1:]

            # dspark: shift-labeled (position p predicts token anchor+1+p
            # given prev = token anchor+p) — proposal j reads position j-1;
            # markov head causal in prev sampled ids
            prev_ids = jnp.zeros((1, 1, bs), jnp.int32)
            out = []
            for j in range(1, bs):
                pos = j - 1
                prev_ids = prev_ids.at[0, 0, pos].set(
                    out[-1] if out else cur
                )
                final = head_fwd(variables, base4, hidden4, None, prev_ids)
                out.append(
                    jnp.argmax(final[0, 0, pos]).astype(jnp.int32)
                )
            return jnp.stack(out)

        def loop(target_params, variables, t_ck, t_cv, t_len, ctx_feat,
                 cur, out_buf, out_cnt, acc_buf, max_new):
            budget = t_ck.shape[3]
            embed = target_params["model.embed_tokens.weight"]
            lm_head = target_params["lm_head.weight"]
            ctx_pos = jnp.arange(budget, dtype=jnp.int32)[None]

            def cond(carry):
                (_tck, _tcv, t_len, _ctx, _cur, _buf, out_cnt, _accb,
                 n_rounds, done) = carry
                return (
                    (~done) & (out_cnt < max_new) & (t_len + bs < budget)
                )

            def body(carry):
                (t_ck, t_cv, t_len, ctx_feat, cur, out_buf, out_cnt,
                 acc_buf, n_rounds, done) = carry
                start = t_len
                block0 = jnp.full((1, bs), self.mask_token_id, jnp.int32)
                block0 = block0.at[0, 0].set(cur)
                noise = jnp.take(embed, block0[0], axis=0)[None].astype(
                    jnp.bfloat16
                )
                draft_pos = (start + idx)[None]
                draft_hidden = draft_fwd(
                    variables, noise, ctx_feat.astype(jnp.bfloat16),
                    ctx_pos, draft_pos, start[None, None],
                    jnp.ones((1, 1), bool),
                )
                proposals = propose(variables, embed, lm_head, draft_hidden,
                                    cur)                    # [bs-1]

                block = jnp.concatenate([cur[None], proposals])[None]
                logits, aux2, t_ck, t_cv = target_cached_forward(
                    target_params, self.target_config, block, t_ck, t_cv,
                    t_len, self.capture_layers,
                )
                posterior = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
                matches = (proposals == posterior[:bs - 1]).astype(jnp.int32)
                acc = jnp.sum(jnp.cumprod(matches))
                bonus = posterior[acc]
                props_p = jnp.concatenate([proposals, bonus[None]])
                emitted = jnp.where(idx < acc, props_p, bonus)  # [bs]

                out_buf = jax.lax.dynamic_update_slice(
                    out_buf, emitted, (out_cnt,)
                )
                acc_buf = jax.lax.dynamic_update_slice(
                    acc_buf, (acc + 1)[None], (n_rounds,)
                )
                # the full block's features land in the buffer; slots past
                # acc+1 sit at indices >= the next anchor and are overwritten
                # before any anchor can expose them (see comment above)
                ctx_feat = jax.lax.dynamic_update_slice(
                    ctx_feat, aux2.astype(ctx_feat.dtype), (0, start, 0)
                )
                done = _fused_stop_hit(emitted, idx <= acc, stop_ids)
                return (
                    t_ck, t_cv, t_len + acc + 1, ctx_feat, bonus, out_buf,
                    out_cnt + acc + 1, acc_buf, n_rounds + 1, done,
                )

            init = (t_ck, t_cv, t_len, ctx_feat, cur, out_buf, out_cnt,
                    acc_buf, jnp.asarray(0, jnp.int32), jnp.asarray(False))
            final = jax.lax.while_loop(cond, body, init)
            return final[5], final[6], final[7], final[8]

        del n_cap  # shape comes in via ctx_feat
        return loop

    def _build_batch_fused(self, batch: int, stop_ids: Tuple[int, ...]):
        """Batched block speculation: B rows propose/verify whole blocks
        together with per-row cache lengths and per-row anchors (the
        index-based DFlash mask rule is already per-row), finished rows
        freeze — the dflash-family counterpart of the eagle batched chain
        loop. Row outputs match ``generate_fused`` (parity-tested)."""
        bs = self.block_size
        projector = self._projector
        shift = bool(getattr(self.draft.config, "shift_label", False))
        idx = jnp.arange(bs, dtype=jnp.int32)
        rows = jnp.arange(batch, dtype=jnp.int32)

        def draft_fwd(variables, noise, ctx, ctx_pos, draft_pos, anchors,
                      keep):
            return self.draft.apply(
                variables, noise, ctx, ctx_pos, draft_pos, anchors, keep
            )

        def head_fwd(variables, base4, hidden4, prev_emb, prev_ids):
            return self.draft.apply(
                variables, base4, prev_token_ids=prev_ids,
                prev_token_embeddings=prev_emb, hidden_states=hidden4,
                method="apply_logits_head",
            )

        def propose(variables, embed, lm_head, draft_hidden, cur):
            base = jnp.einsum(
                "bsh,vh->bsv", draft_hidden.astype(jnp.float32),
                lm_head.astype(jnp.float32),
            )                                               # [B, bs, V]
            if projector == "dflash":
                sel = base[:, :-1] if shift else base[:, 1:]
                return jnp.argmax(sel, axis=-1).astype(jnp.int32)

            hidden4 = draft_hidden[:, None]
            base4 = base[:, None]
            if projector == "domino":
                completed = jnp.full(
                    (batch, bs), self.mask_token_id, jnp.int32
                )
                completed = completed.at[:, 0].set(cur)
                for pos in range(1, bs):
                    prev_emb = jnp.take(
                        embed.astype(jnp.float32), completed, axis=0
                    )[:, None]                              # [B, 1, bs, e]
                    final = head_fwd(variables, base4, hidden4, prev_emb,
                                     None)
                    head_pos = pos - 1 if shift else pos
                    completed = completed.at[:, pos].set(
                        jnp.argmax(
                            final[:, 0, head_pos], axis=-1
                        ).astype(jnp.int32)
                    )
                return completed[:, 1:]

            prev_ids = jnp.zeros((batch, 1, bs), jnp.int32)
            out = []
            for j in range(1, bs):
                pos = j - 1
                prev_ids = prev_ids.at[:, 0, pos].set(
                    out[-1] if out else cur
                )
                final = head_fwd(variables, base4, hidden4, None, prev_ids)
                out.append(
                    jnp.argmax(final[:, 0, pos], axis=-1).astype(jnp.int32)
                )
            return jnp.stack(out, axis=1)                   # [B, bs-1]

        def loop(target_params, variables, t_ck, t_cv, t_len, ctx_feat,
                 cur, out_buf, out_cnt, acc_buf, max_new):
            budget = t_ck.shape[3]
            embed = target_params["model.embed_tokens.weight"]
            lm_head = target_params["lm_head.weight"]
            ctx_pos = jnp.broadcast_to(
                jnp.arange(budget, dtype=jnp.int32)[None], (batch, budget)
            )

            def active_rows(t_len, out_cnt, done):
                return (
                    (~done) & (out_cnt < max_new) & (t_len + bs < budget)
                )

            def cond(carry):
                t_len, out_cnt, done = carry[2], carry[6], carry[9]
                return jnp.any(active_rows(t_len, out_cnt, done))

            def body(carry):
                (t_ck, t_cv, t_len, ctx_feat, cur, out_buf, out_cnt,
                 acc_buf, n_rounds, done) = carry
                active = active_rows(t_len, out_cnt, done)

                block0 = jnp.full(
                    (batch, bs), self.mask_token_id, jnp.int32
                )
                block0 = block0.at[:, 0].set(cur)
                noise = jnp.take(embed, block0, axis=0).astype(jnp.bfloat16)
                draft_pos = t_len[:, None] + idx[None]
                draft_hidden = draft_fwd(
                    variables, noise, ctx_feat.astype(jnp.bfloat16),
                    ctx_pos, draft_pos, t_len[:, None],
                    jnp.ones((batch, 1), bool),
                )
                proposals = propose(
                    variables, embed, lm_head, draft_hidden, cur
                )                                           # [B, bs-1]

                block = jnp.concatenate([cur[:, None], proposals], axis=1)
                logits, aux2, n_tck, n_tcv = target_cached_forward(
                    target_params, self.target_config, block, t_ck, t_cv,
                    t_len, self.capture_layers,
                )
                posterior = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                matches = (
                    proposals == posterior[:, : bs - 1]
                ).astype(jnp.int32)
                acc = jnp.sum(jnp.cumprod(matches, axis=1), axis=1)  # [B]
                bonus = jnp.take_along_axis(
                    posterior, acc[:, None], axis=1
                )[:, 0]
                props_p = jnp.concatenate(
                    [proposals, bonus[:, None]], axis=1
                )
                emitted = jnp.where(
                    idx[None] < acc[:, None], props_p, bonus[:, None]
                )                                           # [B, bs]

                pos = out_cnt[:, None] + idx[None]
                old_out = out_buf[rows[:, None], pos]
                out_buf = out_buf.at[rows[:, None], pos].set(
                    jnp.where(active[:, None], emitted, old_out),
                    mode="drop",
                )
                old_acc = acc_buf[rows, n_rounds]
                acc_buf = acc_buf.at[rows, n_rounds].set(
                    jnp.where(active, acc + 1, old_acc), mode="drop"
                )

                # per-row feature landing at each row's own start; stale
                # slots past acc+1 sit at or beyond the next anchor and
                # the index-based mask hides them (single-row comment)
                slots = t_len[:, None] + idx[None]          # [B, bs]
                new_ctx = ctx_feat.at[rows[:, None], slots].set(
                    aux2.astype(ctx_feat.dtype), mode="drop"
                )
                hit = _fused_stop_hit_rows(
                    emitted, idx[None] <= acc[:, None], stop_ids
                )

                t_ck = jnp.where(
                    active[None, :, None, None, None], n_tck, t_ck
                )
                t_cv = jnp.where(
                    active[None, :, None, None, None], n_tcv, t_cv
                )
                ctx_feat = jnp.where(
                    active[:, None, None], new_ctx, ctx_feat
                )
                step = jnp.where(active, acc + 1, 0)
                return (
                    t_ck, t_cv, t_len + step, ctx_feat,
                    jnp.where(active, bonus, cur), out_buf,
                    out_cnt + step, acc_buf,
                    n_rounds + active.astype(jnp.int32),
                    done | (active & hit),
                )

            init = (t_ck, t_cv, t_len, ctx_feat, cur, out_buf, out_cnt,
                    acc_buf, jnp.zeros((batch,), jnp.int32),
                    jnp.zeros((batch,), bool))
            final = jax.lax.while_loop(cond, body, init)
            return final[5], final[6], final[7], final[8]

        return loop

    def generate_batch_fused(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int,
        stop_token_ids: Optional[Sequence[int]] = None,
    ) -> List[SpecDecodeResult]:
        """Batched block speculation for a BATCH of prompts in one fused
        program (right-padded rows, per-row lengths/anchors, frozen
        finished rows) — per-row outputs match ``generate_fused``
        (parity-tested)."""
        stop_ids = tuple(
            sorted(set(int(s) for s in (stop_token_ids or ())))
        )
        batch = len(prompts)
        lens = np.asarray([len(p) for p in prompts], np.int32)
        p_max = int(lens.max())
        bs = self.block_size
        budget = self.max_len
        padded = np.zeros((batch, p_max), np.int64)
        for i, p in enumerate(prompts):
            padded[i, : len(p)] = p

        if not hasattr(self, "_batch_fused_cache"):
            self._batch_fused_cache = {}
        key = (batch, stop_ids)
        loop = self._batch_fused_cache.get(key)
        if loop is None:
            loop = jax.jit(self._build_batch_fused(batch, stop_ids))
            self._batch_fused_cache[key] = loop

        n_capture = len(self.capture_layers)
        h = self.target_config.hidden_size
        t_state = init_target_state(self.target_config, batch, budget)
        logits, aux, t_ck0, t_cv0 = target_cached_forward(
            self.target_params, self.target_config,
            jnp.asarray(padded, jnp.int32),
            t_state.cache_k, t_state.cache_v, jnp.asarray(0, jnp.int32),
            self.capture_layers,
        )
        lens_d = jnp.asarray(lens)
        cur = jnp.take_along_axis(
            jnp.argmax(logits, axis=-1).astype(jnp.int32),
            lens_d[:, None] - 1, axis=1,
        )[:, 0]
        ctx_feat = jnp.zeros((batch, budget, n_capture * h), jnp.float32)
        ctx_feat = jax.lax.dynamic_update_slice(
            ctx_feat, aux.astype(jnp.float32), (0, 0, 0)
        )
        out_buf = jnp.zeros((batch, budget + bs), jnp.int32)
        out_buf = out_buf.at[:, 0].set(cur)
        acc_buf = jnp.zeros((batch, budget), jnp.int32)
        buf, out_cnt, accs, n_rounds = loop(
            self.target_params, self.draft_variables, t_ck0, t_cv0,
            lens_d, ctx_feat, cur, out_buf, jnp.ones((batch,), jnp.int32),
            acc_buf, jnp.asarray(max_new_tokens, jnp.int32),
        )
        buf = np.asarray(buf)
        out_cnt = np.asarray(out_cnt)
        accs = np.asarray(accs)
        n_rounds = np.asarray(n_rounds)
        return [
            SpecDecodeResult(
                output_ids=np.concatenate(
                    [np.asarray(p, np.int64), buf[i, : out_cnt[i]]]
                ),
                accept_lengths=[int(a) for a in accs[i, : n_rounds[i]]],
                steps=int(n_rounds[i]),
            )
            for i, p in enumerate(prompts)
        ]

    def generate_fused(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: int,
        stop_token_ids: Optional[Sequence[int]] = None,
    ) -> SpecDecodeResult:
        """``generate`` with the whole block-speculation loop in ONE jitted
        program — same tokens and accept lengths (parity-tested)."""
        stop_ids = tuple(
            sorted(set(int(s) for s in (stop_token_ids or ())))
        )
        if not hasattr(self, "_fused_cache"):
            self._fused_cache = {}
        loop = self._fused_cache.get(stop_ids)
        if loop is None:
            loop = jax.jit(self._build_fused(stop_ids))
            self._fused_cache[stop_ids] = loop

        bs = self.block_size
        prompt = np.asarray(prompt_ids, np.int64)[None]
        p_len = prompt.shape[1]
        n_capture = len(self.capture_layers)
        h = self.target_config.hidden_size

        t_state = init_target_state(self.target_config, 1, self.max_len)
        # device-resident prefill (the host helper D2Hs [1, P, V] logits
        # plus the full aux — pure transfer waste for a fused generate)
        logits, aux, t_ck0, t_cv0 = target_cached_forward(
            self.target_params, self.target_config,
            jnp.asarray(prompt, jnp.int32),
            t_state.cache_k, t_state.cache_v, jnp.asarray(0, jnp.int32),
            self.capture_layers,
        )
        t_state = TargetState(t_ck0, t_cv0, p_len)
        cur = jnp.argmax(logits[0, -1]).astype(jnp.int32)

        ctx_feat = jnp.zeros(
            (1, self.max_len, n_capture * h), jnp.float32
        )
        ctx_feat = jax.lax.dynamic_update_slice(
            ctx_feat, aux.astype(jnp.float32), (0, 0, 0)
        )
        out_buf = jnp.zeros((self.max_len + bs,), jnp.int32)
        out_buf = out_buf.at[0].set(cur)
        acc_buf = jnp.zeros((self.max_len,), jnp.int32)
        buf, out_cnt, accs, n_rounds = loop(
            self.target_params, self.draft_variables,
            t_state.cache_k, t_state.cache_v,
            jnp.asarray(t_state.length, jnp.int32),
            ctx_feat, cur, out_buf, jnp.asarray(1, jnp.int32), acc_buf,
            jnp.asarray(max_new_tokens, jnp.int32),
        )
        out_cnt, n_rounds = int(out_cnt), int(n_rounds)
        output = np.concatenate([
            np.asarray(prompt_ids, np.int64), np.asarray(buf)[:out_cnt],
        ])
        return SpecDecodeResult(
            output_ids=output,
            accept_lengths=[int(a) for a in np.asarray(accs)[:n_rounds]],
            steps=n_rounds,
        )


# --------------------------------------------------------------------------
# P-EAGLE COD block speculative decoding
# --------------------------------------------------------------------------

class PEagleSpecDecoder:
    """COD-style serving for a trained P-EAGLE draft (greedy, batch 1).

    The reference ships no P-EAGLE serving path (its peagle/model.py is
    training-only); this decoder serves the TRAINED contract directly: a
    depth-d mask row anchored at position a attends the committed trunk
    (depth-0 rows ≤ a) plus its own lower-depth mask chain
    (ops/peagle_pallas.cod_allow_dense) and predicts the token at
    a + d + 1. One draft forward therefore proposes ``num_depths - 1``
    tokens in parallel — conditioned on features up to the anchor only,
    exactly as trained — and one target forward verifies the chain
    (greedy-equivalence invariant, tested like every other family).

    Per round the draft re-attends the full fixed-size trunk buffer
    (static shapes, one compile); trunk slots at or beyond the committed
    length are masked invalid, so garbage there is unreachable.
    """

    def __init__(
        self,
        target_params,
        target_config: TargetConfig,
        draft_module,                 # PEagleDraftModel
        draft_variables,
        capture_layers: Sequence[int],
        *,
        mask_token_id: int = 0,
        num_depths: int = 4,
        max_len: int = 512,
    ) -> None:
        self.target_params = jax.device_put(target_params)
        self.target_config = target_config
        self.draft = draft_module
        self.draft_variables = jax.device_put(draft_variables)
        self.capture_layers = tuple(capture_layers)
        self.mask_token_id = int(mask_token_id)
        self.num_depths = int(num_depths)
        self.max_len = max_len
        self._d2t = Eagle3SpecDecoder._resolve_d2t(draft_variables)

        d = self.num_depths
        t_slots = max_len + d - 1

        def draft_block(variables, trunk_ids, features, start):
            """One COD proposal forward: trunk rows 0..start-1 (committed
            token + its feature) + D-1 mask rows anchored at start-1.
            Returns draft-vocab logits of the mask rows [D-1, Vd]."""
            mod = self.draft

            def run(m):
                anchor = jnp.concatenate([
                    jnp.arange(max_len, dtype=jnp.int32),
                    jnp.full((d - 1,), start - 1, jnp.int32),
                ])
                depth = jnp.concatenate([
                    jnp.zeros((max_len,), jnp.int32),
                    jnp.arange(1, d, dtype=jnp.int32),
                ])
                valid = jnp.concatenate([
                    jnp.arange(max_len) < start,
                    jnp.ones((d - 1,), bool),
                ])
                doc = jnp.where(valid, 0, -1)
                from specforge_tpu.ops.peagle_pallas import cod_allow_dense

                allow = cod_allow_dense(
                    anchor, depth, doc, valid.astype(jnp.int32)
                )[None]
                positions = anchor + depth

                ids = jnp.concatenate([
                    trunk_ids,
                    jnp.full((d - 1,), self.mask_token_id, jnp.int32),
                ])[None]
                emb = m.embed_input_ids(ids)
                mask_h = m.get_mask_hidden()[0, 0]
                feats = jnp.concatenate([
                    features,
                    jnp.broadcast_to(
                        mask_h.astype(features.dtype),
                        (d - 1, features.shape[-1]),
                    ),
                ])[None]
                hidden = m.project_hidden_states(feats)
                h = m.backbone(emb, hidden, allow, positions[None])
                logits = m.compute_logits(h)
                return logits[0, max_len:]

            return mod.apply(variables, method=run)

        self._draft_block = jax.jit(draft_block)
        del t_slots

    def _build_fused(self, stop_ids: Tuple[int, ...]):
        """The whole COD speculation loop as ONE jitted ``lax.while_loop``
        program — same structure as the other families' fused loops; emits
        the host loop's tokens and accept lengths (parity-tested)."""
        d = self.num_depths
        k = d - 1
        max_len = self.max_len
        idx = jnp.arange(k + 1, dtype=jnp.int32)
        d2t = jnp.asarray(self._d2t, jnp.int32)
        draft_block = self._draft_block

        def loop(target_params, variables, t_ck, t_cv, t_len, trunk_ids,
                 features, cur, out_buf, out_cnt, acc_buf, max_new):
            budget = t_ck.shape[3]

            def cond(carry):
                (_tck, _tcv, t_len, _ids, _f, _cur, _buf, out_cnt, _accb,
                 n_rounds, done) = carry
                return (
                    (~done) & (out_cnt < max_new)
                    & (t_len + k + 1 < budget) & (t_len + k + 1 < max_len)
                )

            def body(carry):
                (t_ck, t_cv, t_len, trunk_ids, features, cur, out_buf,
                 out_cnt, acc_buf, n_rounds, done) = carry
                dlogits = draft_block(
                    variables, trunk_ids, features, t_len
                )                                            # [k, Vd]
                dts = jnp.argmax(dlogits, axis=-1).astype(jnp.int32)
                proposals = dts + jnp.take(d2t, dts)

                block = jnp.concatenate([cur[None], proposals])[None]
                logits, aux, t_ck, t_cv = target_cached_forward(
                    target_params, self.target_config, block, t_ck, t_cv,
                    t_len, self.capture_layers,
                )
                posterior = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
                matches = (proposals == posterior[:k]).astype(jnp.int32)
                acc = jnp.sum(jnp.cumprod(matches))
                bonus = posterior[acc]
                props_p = jnp.concatenate([proposals, bonus[None]])
                emitted = jnp.where(idx < acc, props_p, bonus)  # [k+1]

                out_buf = jax.lax.dynamic_update_slice(
                    out_buf, emitted, (out_cnt,)
                )
                acc_buf = jax.lax.dynamic_update_slice(
                    acc_buf, (acc + 1)[None], (n_rounds,)
                )
                # the block's first acc+1 rows commit: tokens + features
                # join the trunk (stale entries past acc+1 sit beyond the
                # new length and the valid mask hides them)
                tok_block = jnp.concatenate([cur[None], proposals])
                trunk_ids = jax.lax.dynamic_update_slice(
                    trunk_ids, tok_block, (t_len,)
                )
                features = jax.lax.dynamic_update_slice(
                    features, aux[0].astype(features.dtype), (t_len, 0)
                )
                done = _fused_stop_hit(emitted, idx <= acc, stop_ids)
                return (
                    t_ck, t_cv, t_len + acc + 1, trunk_ids, features,
                    bonus, out_buf, out_cnt + acc + 1, acc_buf,
                    n_rounds + 1, done,
                )

            init = (t_ck, t_cv, t_len, trunk_ids, features, cur, out_buf,
                    out_cnt, acc_buf, jnp.asarray(0, jnp.int32),
                    jnp.asarray(False))
            final = jax.lax.while_loop(cond, body, init)
            return final[6], final[7], final[8], final[9]

        return loop

    def generate_fused(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: int,
        stop_token_ids: Optional[Sequence[int]] = None,
    ) -> SpecDecodeResult:
        """``generate`` with the whole COD loop in ONE jitted program —
        same tokens and accept lengths (parity-tested)."""
        stop_ids = tuple(
            sorted(set(int(s) for s in (stop_token_ids or ())))
        )
        if not hasattr(self, "_fused_cache"):
            self._fused_cache = {}
        loop = self._fused_cache.get(stop_ids)
        if loop is None:
            loop = jax.jit(self._build_fused(stop_ids))
            self._fused_cache[stop_ids] = loop

        k = self.num_depths - 1
        prompt = np.asarray(prompt_ids, np.int64)[None]
        p_len = prompt.shape[1]
        n_capture = len(self.capture_layers)
        h = self.target_config.hidden_size

        t_state = init_target_state(self.target_config, 1, self.max_len)
        logits, aux, t_ck0, t_cv0 = target_cached_forward(
            self.target_params, self.target_config,
            jnp.asarray(prompt, jnp.int32),
            t_state.cache_k, t_state.cache_v, jnp.asarray(0, jnp.int32),
            self.capture_layers,
        )
        cur = jnp.argmax(logits[0, -1]).astype(jnp.int32)
        trunk_ids = jnp.zeros((self.max_len,), jnp.int32)
        trunk_ids = jax.lax.dynamic_update_slice(
            trunk_ids, jnp.asarray(prompt[0], jnp.int32), (0,)
        )
        features = jnp.zeros((self.max_len, n_capture * h), jnp.float32)
        features = jax.lax.dynamic_update_slice(
            features, aux[0].astype(jnp.float32), (0, 0)
        )
        out_buf = jnp.zeros((self.max_len + k + 1,), jnp.int32)
        out_buf = out_buf.at[0].set(cur)
        acc_buf = jnp.zeros((self.max_len,), jnp.int32)
        buf, out_cnt, accs, n_rounds = loop(
            self.target_params, self.draft_variables, t_ck0, t_cv0,
            jnp.asarray(p_len, jnp.int32), trunk_ids, features, cur,
            out_buf, jnp.asarray(1, jnp.int32), acc_buf,
            jnp.asarray(max_new_tokens, jnp.int32),
        )
        out_cnt, n_rounds = int(out_cnt), int(n_rounds)
        return SpecDecodeResult(
            output_ids=np.concatenate([
                np.asarray(prompt_ids, np.int64),
                np.asarray(buf)[:out_cnt],
            ]),
            accept_lengths=[int(a) for a in np.asarray(accs)[:n_rounds]],
            steps=n_rounds,
        )

    def generate(
        self,
        prompt_ids: Sequence[int],
        max_new_tokens: int,
        stop_token_ids: Optional[Sequence[int]] = None,
    ) -> SpecDecodeResult:
        stop = set(stop_token_ids or ())
        d = self.num_depths
        k = d - 1  # proposals per round
        prompt = np.asarray(prompt_ids, np.int64)[None]
        p_len = prompt.shape[1]
        n_capture = len(self.capture_layers)
        h = self.target_config.hidden_size

        t_state = init_target_state(self.target_config, 1, self.max_len)
        logits, aux, ck, cv = target_cached_forward(
            self.target_params, self.target_config,
            jnp.asarray(prompt, jnp.int32),
            t_state.cache_k, t_state.cache_v, jnp.asarray(0, jnp.int32),
            self.capture_layers,
        )
        t_state = TargetState(ck, cv, p_len)
        features = np.zeros((self.max_len, n_capture * h), np.float32)
        features[:p_len] = np.asarray(aux[0], np.float32)
        trunk_ids = np.zeros((self.max_len,), np.int32)
        trunk_ids[:p_len] = prompt[0]
        cur = int(np.asarray(logits[0, -1]).argmax())
        output = list(prompt_ids) + [cur]

        accept_lengths: List[int] = []
        steps = 0
        start = p_len      # features cover [0, start); cur sits at start
        while (
            len(output) - p_len < max_new_tokens
            and start + k + 1 < self.max_len
        ):
            steps += 1
            dlogits = np.asarray(self._draft_block(
                self.draft_variables, jnp.asarray(trunk_ids),
                jnp.asarray(features, jnp.float32),
                jnp.asarray(start, jnp.int32),
            ))                                           # [k, Vd]
            dts = dlogits.argmax(axis=-1)
            proposals = [int(t) + int(self._d2t[int(t)]) for t in dts]

            block = np.asarray([[cur, *proposals]], np.int64)
            logits, aux, ck, cv = target_cached_forward(
                self.target_params, self.target_config,
                jnp.asarray(block, jnp.int32),
                t_state.cache_k, t_state.cache_v,
                jnp.asarray(t_state.length, jnp.int32),
                self.capture_layers,
            )
            posterior = np.asarray(logits[0]).argmax(axis=-1)
            accepted = 0
            for j in range(k):
                if proposals[j] == int(posterior[j]):
                    accepted += 1
                else:
                    break
            emitted = [*proposals[:accepted], int(posterior[accepted])]
            output.extend(emitted)
            accept_lengths.append(accepted + 1)

            t_state = TargetState(
                cache_k=ck, cache_v=cv,
                length=t_state.length + accepted + 1,
            )
            # the block's first accepted+1 rows are now committed: their
            # tokens and features join the trunk
            feats_new = np.asarray(aux[0, : accepted + 1], np.float32)
            features[start: start + accepted + 1] = feats_new
            trunk_ids[start] = cur
            for j in range(accepted):
                trunk_ids[start + 1 + j] = proposals[j]
            start += accepted + 1
            cur = int(posterior[accepted])
            if stop & set(emitted):
                break
        return SpecDecodeResult(
            output_ids=np.asarray(output),
            accept_lengths=accept_lengths,
            steps=steps,
        )
