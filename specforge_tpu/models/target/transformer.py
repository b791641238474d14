"""Frozen target transformer for feature capture.

A functional (params-dict) decoder covering the Llama / Qwen2 / Qwen3 config
families — enough to run *prefill* of the target model on TPU and capture the
EAGLE3/DFlash training features (per-layer hidden states + post-norm last
hidden). This replaces the reference's in-process SGLang model runner for
offline capture (specforge/offline_capture/sglang_backend/, SURVEY §2.7).

Params are a flat ``{hf_key: array}`` dict loaded straight from safetensors
shards, so no weight conversion step exists; compute is bf16 with fp32 norms
and fp32 attention logits.

Capture convention: ``hidden_states[0]`` is the embedding output and
``hidden_states[i+1]`` the output of layer ``i`` — aux features gather
``hidden_states[layer_id + 1]``, matching the reference
``extract_context_feature`` offset (modeling/draft/dflash.py:284-293).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from specforge_tpu.ops.attention import NEG_INF, make_causal_bias
from specforge_tpu.ops.rope import RopeSpec, apply_rope, rope_cos_sin


@dataclass(frozen=True)
class TargetConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False
    attention_bias: bool = False
    qk_norm: bool = False          # qwen3-style per-head q/k norms
    model_type: str = "llama"
    hidden_act: str = "silu"
    # MoE (qwen3_moe family)
    num_experts: int = 0
    num_experts_per_tok: int = 0
    norm_topk_prob: bool = False
    moe_intermediate_size: Optional[int] = None
    decoder_sparse_step: int = 1
    mlp_only_layers: Tuple[int, ...] = ()

    @property
    def resolved_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    def is_moe_layer(self, layer_idx: int) -> bool:
        """HF Qwen3Moe rule: sparse unless listed dense or off-cadence."""
        return (
            self.num_experts > 0
            and layer_idx not in self.mlp_only_layers
            and (layer_idx + 1) % max(self.decoder_sparse_step, 1) == 0
        )

    @classmethod
    def from_file(cls, path: str) -> "TargetConfig":
        with open(os.path.join(path, "config.json")) as f:
            raw = json.load(f)
        raw = raw.get("text_config", raw)
        model_type = raw.get("model_type", "llama")
        return cls(
            vocab_size=raw["vocab_size"],
            hidden_size=raw["hidden_size"],
            intermediate_size=raw["intermediate_size"],
            num_hidden_layers=raw["num_hidden_layers"],
            num_attention_heads=raw["num_attention_heads"],
            num_key_value_heads=raw.get(
                "num_key_value_heads", raw["num_attention_heads"]
            ),
            head_dim=raw.get("head_dim"),
            rms_norm_eps=raw.get("rms_norm_eps", 1e-6),
            rope_theta=raw.get("rope_theta", 10000.0),
            rope_scaling=raw.get("rope_scaling"),
            max_position_embeddings=raw.get("max_position_embeddings", 32768),
            tie_word_embeddings=raw.get("tie_word_embeddings", False),
            attention_bias=raw.get(
                "attention_bias", model_type in ("qwen2",)
            ),
            qk_norm=model_type in ("qwen3", "qwen3_moe"),
            model_type=model_type,
            hidden_act=raw.get("hidden_act", "silu"),
            num_experts=raw.get("num_experts", 0) or 0,
            num_experts_per_tok=raw.get("num_experts_per_tok", 0) or 0,
            norm_topk_prob=raw.get("norm_topk_prob", False),
            moe_intermediate_size=raw.get("moe_intermediate_size"),
            decoder_sparse_step=raw.get("decoder_sparse_step", 1) or 1,
            mlp_only_layers=tuple(raw.get("mlp_only_layers", []) or []),
        )


def load_target_params(
    path: str, config: TargetConfig, dtype=jnp.bfloat16
) -> Dict[str, jnp.ndarray]:
    """Load every decoder weight from the HF safetensors shards."""
    from safetensors import safe_open

    index_files = glob.glob(os.path.join(path, "*.index.json"))
    key_to_shard: Dict[str, str] = {}
    if index_files:
        with open(index_files[0]) as f:
            key_to_shard = json.load(f)["weight_map"]
    else:
        single = os.path.join(path, "model.safetensors")
        with safe_open(single, framework="numpy") as f:
            for key in f.keys():
                key_to_shard[key] = "model.safetensors"

    wanted_prefixes = ("model.", "lm_head.")
    by_shard: Dict[str, List[str]] = {}
    for key, shard in key_to_shard.items():
        if key.startswith(wanted_prefixes):
            by_shard.setdefault(shard, []).append(key)

    params: Dict[str, jnp.ndarray] = {}
    for shard, keys in sorted(by_shard.items()):
        with safe_open(os.path.join(path, shard), framework="numpy") as f:
            for key in keys:
                arr = f.get_tensor(key)
                if np.issubdtype(arr.dtype, np.floating) or str(
                    arr.dtype
                ) == "bfloat16":
                    params[key] = jnp.asarray(arr).astype(dtype)
                else:
                    params[key] = jnp.asarray(arr)
    if config.tie_word_embeddings and "lm_head.weight" not in params:
        params["lm_head.weight"] = params["model.embed_tokens.weight"]
    return params


def _rms(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(var + eps)
    return weight.astype(dtype) * x32.astype(dtype)


def _act(name: str):
    return {"silu": jax.nn.silu, "gelu": jax.nn.gelu,
            "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True)}[
        name
    ]


def _moe_route_w(router_weight, cfg, y):
    """softmax router → (top_w [.., k] fp32, top_i [.., k] int32)."""
    router = y @ router_weight.T
    probs = jax.nn.softmax(router.astype(jnp.float32), axis=-1)
    top_w, top_i = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    return top_w, top_i


def _moe_route(params, cfg, prefix, y):
    return _moe_route_w(params[f"{prefix}.mlp.gate.weight"], cfg, y)


def _moe_assignments(router_weight, cfg, x, token_valid=None):
    """Route ``x [t, h]`` and sort the ``t*k`` (token, expert) assignments by
    expert id (stable: ties keep token order) — the shared preamble of the
    gathered and EP paths, so their ordering can never diverge.

    ``token_valid [t]`` (optional bool): invalid (padding) tokens get the
    out-of-range expert id ``E`` so they sort last and join no group — they
    consume no group capacity and contribute nothing.

    Returns ``(order [m], token_of [m], flat_weight [m], group_sizes [E])``.
    """
    e, k = cfg.num_experts, cfg.num_experts_per_tok
    t = x.shape[0]
    m = t * k
    top_w, top_i = _moe_route_w(router_weight, cfg, x)
    flat_expert = top_i.reshape(m)
    flat_weight = top_w.reshape(m)
    if token_valid is not None:
        valid = jnp.repeat(token_valid.reshape(t), k)
        flat_expert = jnp.where(valid, flat_expert, e)
    order = jnp.argsort(flat_expert)
    token_of = order // k
    # explicit drop-mode scatter: sentinel ids (== E) must not be counted
    group_sizes = (
        jnp.zeros((e,), jnp.int32).at[flat_expert]
        .add(1, mode="drop")
    )
    return order, token_of, flat_weight, group_sizes


def _moe_mlp_dense(params: Dict[str, jnp.ndarray], cfg: "TargetConfig",
                   prefix: str, y: jnp.ndarray) -> jnp.ndarray:
    """Reference path: ``lax.scan`` over ALL experts with per-token routing
    weights (0 off the top-k) — O(E) FLOPs, memory one expert wide."""
    e = cfg.num_experts
    top_w, top_i = _moe_route(params, cfg, prefix, y)
    # scatter back to a dense [.., E] routing-weight map via one-hots
    w_full = jnp.sum(
        jax.nn.one_hot(top_i, e, dtype=jnp.float32) * top_w[..., None],
        axis=-2,
    )

    gate_w = jnp.stack(
        [params[f"{prefix}.mlp.experts.{i}.gate_proj.weight"] for i in range(e)]
    )
    up_w = jnp.stack(
        [params[f"{prefix}.mlp.experts.{i}.up_proj.weight"] for i in range(e)]
    )
    down_w = jnp.stack(
        [params[f"{prefix}.mlp.experts.{i}.down_proj.weight"] for i in range(e)]
    )
    act = _act(cfg.hidden_act)

    def body(acc, xs):
        gw, uw, dw, w_e = xs
        out = (act(y @ gw.T) * (y @ uw.T)) @ dw.T
        return acc + w_e[..., None].astype(out.dtype) * out, None

    out, _ = jax.lax.scan(
        body, jnp.zeros_like(y),
        (gate_w, up_w, down_w, jnp.moveaxis(w_full, -1, 0)),
    )
    return out


def _moe_mlp_gathered(params: Dict[str, jnp.ndarray], cfg: "TargetConfig",
                      prefix: str, y: jnp.ndarray) -> jnp.ndarray:
    """Gather-by-expert fast path: sort token→expert assignments and run
    grouped matmuls via ``lax.ragged_dot`` — FLOPs ∝ top-k, not n_experts
    (VERDICT item 8; the TPU-native answer to the reference's EP capture
    knobs, ref schema.py:863-876). Static shapes throughout: [T·k] sorted
    assignments, group sizes by bincount."""
    e = cfg.num_experts
    b, s, h = y.shape
    t = b * s
    x = y.reshape(t, h)
    order, token_of, flat_weight, group_sizes = _moe_assignments(
        params[f"{prefix}.mlp.gate.weight"], cfg, x
    )
    xs = jnp.take(x, token_of, axis=0)         # [t*k, h] gathered inputs

    # rhs layouts for ragged_dot: [E, in, out]
    gate_w = jnp.stack(
        [params[f"{prefix}.mlp.experts.{i}.gate_proj.weight"].T
         for i in range(e)]
    )
    up_w = jnp.stack(
        [params[f"{prefix}.mlp.experts.{i}.up_proj.weight"].T
         for i in range(e)]
    )
    down_w = jnp.stack(
        [params[f"{prefix}.mlp.experts.{i}.down_proj.weight"].T
         for i in range(e)]
    )
    act = _act(cfg.hidden_act)
    g = jax.lax.ragged_dot(xs, gate_w, group_sizes)
    u = jax.lax.ragged_dot(xs, up_w, group_sizes)
    d = jax.lax.ragged_dot((act(g) * u).astype(xs.dtype), down_w, group_sizes)
    weighted = d * jnp.take(flat_weight, order)[:, None].astype(d.dtype)
    out = jnp.zeros((t, h), d.dtype).at[token_of].add(weighted)
    return out.reshape(b, s, h).astype(y.dtype)


def stack_moe_expert_params(params, cfg, mesh=None, ep_axis: str = "fsdp"):
    """Replace per-expert weight leaves with one stacked rhs-layout tensor
    per projection — ``{prefix}.mlp.experts.{gate,up,down}_stacked`` with
    shapes ``[E, in, out]`` — sharded over ``ep_axis`` on the expert dim
    when a mesh is given. Required by the EP MoE path (``_moe_mlp_ep``).

    Stacking transiently materializes one full ``[E, in, out]`` tensor per
    projection per layer before the expert-dim device_put; for targets whose
    expert tables exceed host+device transient memory, pre-stack offline.
    """
    out = dict(params)
    ns = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        if cfg.num_experts % mesh.shape[ep_axis] != 0:
            raise ValueError(
                f"num_experts={cfg.num_experts} not divisible by "
                f"{ep_axis}={mesh.shape[ep_axis]}"
            )
        ns = NamedSharding(mesh, PartitionSpec(ep_axis))
    for i in range(cfg.num_hidden_layers):
        if not cfg.is_moe_layer(i):
            continue
        prefix = f"model.layers.{i}"
        for name in ("gate", "up", "down"):
            key = f"{prefix}.mlp.experts.{name}_stacked"
            if key in out:
                continue  # already stacked (idempotent / pre-stacked params)
            ws = [
                out.pop(f"{prefix}.mlp.experts.{j}.{name}_proj.weight")
                for j in range(cfg.num_experts)
            ]
            stacked = jnp.stack([w.T for w in ws])  # [E, in, out]
            if ns is not None:
                stacked = jax.device_put(stacked, ns)
            out[key] = stacked
    return out


def _moe_mlp_ep(
    params: Dict[str, jnp.ndarray],
    cfg: "TargetConfig",
    prefix: str,
    y: jnp.ndarray,
    mesh,
    ep_axis: str = "fsdp",
    capacity_factor: Optional[float] = None,
    token_valid: Optional[jnp.ndarray] = None,  # [B, S] bool/int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expert-parallel MoE: expert-stacked weights stay sharded over
    ``ep_axis`` (no all-gather of expert tables); every shard computes the
    contributions of its local experts and the outputs ``psum`` over ICI.
    The TPU-native answer to the reference's capture-server EP knobs
    (ref specforge/config/schema.py:863-876 sglang_ep_size).

    Exactness: assignments are sorted by expert id, so a shard's rows form
    one contiguous range of the sorted order; the shard processes a static
    window of ``capacity`` rows around that range. Out-of-range rows inside
    the window are absorbed into the edge groups and their scatter weights
    masked to zero, so their contribution is exactly 0 (the owning shard
    produces it instead). ``capacity_factor=None`` uses capacity = all
    rows — never drops, memory-scaled EP.
    A float capacity_factor bounds per-shard work at
    ``ceil(cf·rows/ep)`` for FLOP-scaled EP; rows past capacity are NOT
    computed and are counted in the returned ``overflow`` scalar — callers
    must check it (the capture runner aborts on overflow > 0).

    Returns ``(out [B,S,H], overflow int32 scalar)``.
    """
    e, k = cfg.num_experts, cfg.num_experts_per_tok
    ep = mesh.shape[ep_axis]
    b, s, h = y.shape
    t = b * s
    m = t * k
    e_local = e // ep
    if capacity_factor is None:
        cap = m
    else:
        cap = max(1, min(m, int(np.ceil(capacity_factor * m / ep))))

    gate_w = params[f"{prefix}.mlp.experts.gate_stacked"]
    up_w = params[f"{prefix}.mlp.experts.up_stacked"]
    down_w = params[f"{prefix}.mlp.experts.down_stacked"]
    router_w = params[f"{prefix}.mlp.gate.weight"]
    act = _act(cfg.hidden_act)

    from jax.sharding import PartitionSpec as P

    def shard_fn(yv, valid, rw, gw, uw, dw):
        x = yv.reshape(t, h)
        # routing is replicated work (tiny): identical on every shard, so
        # the sorted order below is globally agreed without communication;
        # padding tokens (valid == 0) join no group and consume no capacity
        order, token_of, flat_weight, group_sizes = _moe_assignments(
            rw, cfg, x, token_valid=valid
        )

        p = jax.lax.axis_index(ep_axis)
        lo = p * e_local
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(group_sizes)]
        )
        start = starts[lo]
        local_rows = starts[lo + e_local] - start
        start_cl = jnp.clip(start, 0, m - cap)
        # slice the assignment window FIRST, then gather its cap inputs —
        # gathering all m rows per shard would defeat FLOP-scaled EP
        ord_window = jax.lax.dynamic_slice(order, (start_cl,), (cap,))
        tok_window = jax.lax.dynamic_slice(token_of, (start_cl,), (cap,))
        window = jnp.take(x, tok_window, axis=0)       # [cap, h]
        w_window = jnp.take(flat_weight, ord_window)

        # group sizes inside the window: clip the local groups to the rows
        # that fit after the pre-slack, absorb the out-of-range rows
        # (before/after the local range) into the FIRST/LAST local group —
        # they get computed against a real expert, but their scatter
        # weights are masked to zero below, so their contribution is
        # exactly 0 without materializing zero dummy experts (which would
        # copy the full local expert stacks every forward)
        pre = start - start_cl
        gs_local = jax.lax.dynamic_slice(group_sizes, (lo,), (e_local,))
        avail = jnp.maximum(cap - pre, 0)
        cum = jnp.cumsum(gs_local)
        cum_cl = jnp.minimum(cum, avail)
        gs_cl = cum_cl - jnp.concatenate(
            [jnp.zeros((1,), cum_cl.dtype), cum_cl[:-1]]
        )
        used = cum_cl[-1]
        post = cap - pre - used
        overflow = local_rows - used

        gsz = gs_cl.at[0].add(pre).at[e_local - 1].add(post).astype(jnp.int32)
        g_ = jax.lax.ragged_dot(window, gw, gsz)
        u_ = jax.lax.ragged_dot(window, uw, gsz)
        d_ = jax.lax.ragged_dot(
            (act(g_) * u_).astype(window.dtype), dw, gsz
        )
        row = jax.lax.broadcasted_iota(jnp.int32, (cap,), 0)
        in_local = (row >= pre) & (row < pre + used)
        weighted = d_ * jnp.where(
            in_local, w_window, 0.0
        )[:, None].astype(d_.dtype)
        out = jnp.zeros((t, h), d_.dtype).at[tok_window].add(weighted)
        out = jax.lax.psum(out, ep_axis)
        overflow = jax.lax.psum(overflow, ep_axis)
        return out.reshape(b, s, h).astype(yv.dtype), overflow

    valid = (
        jnp.ones((t,), jnp.bool_) if token_valid is None
        else token_valid.reshape(t).astype(jnp.bool_)
    )
    out, overflow = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(ep_axis), P(ep_axis), P(ep_axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )(y, valid, router_w, gate_w, up_w, down_w)
    return out, overflow


def _moe_mlp(params, cfg, prefix, y, impl: Optional[str] = None):
    impl = impl or os.environ.get("SPECFORGE_MOE_IMPL", "gathered")
    if impl == "dense":
        return _moe_mlp_dense(params, cfg, prefix, y)
    if impl != "gathered":
        # loud failure instead of a silent gathered fallback: "ep" in
        # particular needs a mesh + stacked params and is requested through
        # the capture runner / target_capture_forward(moe_impl="ep")
        raise ValueError(
            f"unknown MoE impl {impl!r}: use 'dense', 'gathered', or "
            f"request 'ep' via the capture runner (it needs a device mesh)"
        )
    return _moe_mlp_gathered(params, cfg, prefix, y)


def target_capture_forward(
    params: Dict[str, jnp.ndarray],
    config: TargetConfig,
    input_ids: jnp.ndarray,        # [B, S]
    attention_mask: Optional[jnp.ndarray],  # [B, S]
    capture_layers: Sequence[int],
    moe_impl: Optional[str] = None,
    moe_mesh=None,
    moe_capacity_factor: Optional[float] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Prefill forward → (aux concat [B, S, L*H], post-norm last hidden
    [B, S, H], moe_overflow int32 scalar).

    ``moe_overflow`` is structurally 0 except under ``moe_impl="ep"`` with a
    bounded ``moe_capacity_factor``, where it counts expert assignments NOT
    computed — it MUST be 0 for the capture to be exact (see
    ``_moe_mlp_ep``; EP requires ``moe_mesh`` +
    ``stack_moe_expert_params``-prepared params)."""
    cfg = config
    b, s = input_ids.shape
    d = cfg.resolved_head_dim
    h, kvh = cfg.num_attention_heads, cfg.num_key_value_heads
    g = h // kvh
    rope_spec = RopeSpec.from_config(cfg)
    capture_set = set(int(c) for c in capture_layers)

    x = jnp.take(params["model.embed_tokens.weight"], input_ids, axis=0)
    bias = make_causal_bias(attention_mask, b, s)
    position_ids = jnp.broadcast_to(
        jnp.arange(s, dtype=jnp.int32)[None], (b, s)
    )
    cos, sin = rope_cos_sin(rope_spec, position_ids, s, dtype=x.dtype)

    captured: Dict[int, jnp.ndarray] = {}
    if -1 in capture_set:  # embedding output, offset convention: id -1 → h[0]
        captured[-1] = x
    moe_overflow = jnp.zeros((), jnp.int32)

    for i in range(cfg.num_hidden_layers):
        prefix = f"model.layers.{i}"
        residual = x
        y = _rms(x, params[f"{prefix}.input_layernorm.weight"],
                 cfg.rms_norm_eps)

        def proj(name, val):
            w = params[f"{prefix}.self_attn.{name}.weight"]
            out = val @ w.T
            bias_key = f"{prefix}.self_attn.{name}.bias"
            if bias_key in params:
                out = out + params[bias_key]
            return out

        q = proj("q_proj", y).reshape(b, s, h, d)
        k = proj("k_proj", y).reshape(b, s, kvh, d)
        v = proj("v_proj", y).reshape(b, s, kvh, d)
        if cfg.qk_norm:
            q = _rms(q, params[f"{prefix}.self_attn.q_norm.weight"],
                     cfg.rms_norm_eps)
            k = _rms(k, params[f"{prefix}.self_attn.k_norm.weight"],
                     cfg.rms_norm_eps)
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        q, k = apply_rope(q, k, cos, sin)

        qg = q.reshape(b, kvh, g, s, d)
        w = jnp.einsum(
            "bkgsd,bktd->bkgst", qg, k, preferred_element_type=jnp.float32
        ) / (d ** 0.5)
        w = w + bias[:, :, None].astype(jnp.float32)
        p = jax.nn.softmax(w, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bkgst,bktd->bkgsd", p, v)
        attn = attn.reshape(b, h, s, d).transpose(0, 2, 1, 3).reshape(
            b, s, h * d
        )
        attn = attn @ params[f"{prefix}.self_attn.o_proj.weight"].T
        x = residual + attn

        residual = x
        y = _rms(x, params[f"{prefix}.post_attention_layernorm.weight"],
                 cfg.rms_norm_eps)
        if cfg.is_moe_layer(i):
            if moe_impl == "ep":
                y, overflow = _moe_mlp_ep(
                    params, cfg, prefix, y, moe_mesh,
                    capacity_factor=moe_capacity_factor,
                    token_valid=attention_mask,
                )
                moe_overflow = moe_overflow + overflow
            else:
                y = _moe_mlp(params, cfg, prefix, y, impl=moe_impl)
        else:
            gate = y @ params[f"{prefix}.mlp.gate_proj.weight"].T
            up = y @ params[f"{prefix}.mlp.up_proj.weight"].T
            y = (_act(cfg.hidden_act)(gate) * up) @ params[
                f"{prefix}.mlp.down_proj.weight"
            ].T
        x = residual + y

        if i in capture_set:
            captured[i] = x

    last_hidden = _rms(x, params["model.norm.weight"], cfg.rms_norm_eps)
    missing = capture_set - set(captured)
    if missing:
        raise ValueError(
            f"capture layers {sorted(missing)} out of range "
            f"(0..{cfg.num_hidden_layers - 1})"
        )
    aux = jnp.concatenate(
        [captured[i] for i in capture_layers], axis=-1
    )
    return aux, last_hidden, moe_overflow
