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


# model families the capture forward cannot run — composition-time failure
# with a named reason beats a silent wrong forward at capture time
# (round-2 verdict item 2: "fail fast at composition, not at capture time")
UNSUPPORTED_MODEL_TYPES = {
    "bailing_moe": "not present in the installed transformers; no parity "
                   "oracle available",
}


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

    # --- family extensions (round 3) ---
    # attention variant: "standard" | "mla" (deepseek v2/v3, kimi)
    attn_variant: str = "standard"
    q_lora_rank: Optional[int] = None
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    rope_interleave: bool = False
    # v3 multiplies the softmax scale by yarn mscale^2; v2 does not
    # (HF DeepseekV3Attention.__init__ vs DeepseekV2Attention.__init__)
    mla_logit_mscale: bool = False
    # per-layer attention kinds: "full_attention" | "sliding_attention"
    # (gemma3, gpt-oss); empty = all full
    layer_types: Tuple[str, ...] = ()
    sliding_window: Optional[int] = None
    rope_local_base_freq: Optional[float] = None   # gemma3 sliding-layer theta
    query_pre_attn_scalar: Optional[float] = None  # gemma3 attention scale
    attn_logit_softcapping: Optional[float] = None
    norm_style: str = "standard"   # "gemma" = fp32 x_norm * (1 + w)
    sandwich_norms: bool = False   # gemma3 post-attention/post-mlp norms
    embed_scale: Optional[float] = None            # gemma3 sqrt(hidden)
    attention_sinks: bool = False  # gpt-oss learned per-head sink logits
    partial_rotary_factor: float = 1.0             # glm4_moe 0.5
    # MoE variant: "qwen" (softmax top-k over gate.weight) |
    # "deepseek" (sigmoid/softmax grouped router + shared experts) |
    # "gptoss" (fused clamp-swiglu experts, router bias)
    moe_variant: str = "qwen"
    n_shared_experts: int = 0
    routed_scaling_factor: float = 1.0
    scoring_func: str = "softmax"   # deepseek v2 softmax, v3 sigmoid
    topk_method: str = "greedy"     # greedy|group_limited_greedy|noaux_tc
    n_group: int = 1
    topk_group: int = 1
    first_k_dense_replace: int = 0
    moe_alpha: float = 1.702        # gpt-oss clamp-swiglu
    moe_limit: float = 7.0
    # llama4: rope skipped on listed layers (value 0), chunked attention on
    # rope layers, L2 (weightless) qk norm, nope-layer temperature tuning,
    # input-scaled fused experts + always-on shared expert, dense layers
    # with their own intermediate size
    no_rope_layers: Tuple[int, ...] = ()
    attention_chunk_size: Optional[int] = None
    qk_l2_norm: bool = False
    attn_temperature_tuning: bool = False
    attn_scale: float = 0.1
    floor_scale: float = 8192.0
    moe_layers: Tuple[int, ...] = ()
    intermediate_size_mlp: Optional[int] = None
    # qwen3_next: hybrid gated-deltanet linear attention + gated full
    # attention (HF Qwen3NextGatedDeltaNet / Qwen3NextAttention);
    # layer_types carries "linear_attention" entries
    attn_output_gate: bool = False   # q_proj carries a sigmoid output gate
    shared_expert_gated: bool = False  # sigmoid-gated always-on shared MLP
    linear_num_value_heads: int = 0
    linear_num_key_heads: int = 0
    linear_key_head_dim: int = 0
    linear_value_head_dim: int = 0
    linear_conv_kernel_dim: int = 4
    # longcat_flash: dual-sublayer logical layers (2×MLA + 2×dense MLP +
    # one shortcut MoE), zero-computation (identity) experts, LoRA q/kv
    # rescaling inside MLA (HF LongcatFlashDecoderLayer / LongcatFlashMLA)
    dual_sublayer: bool = False
    zero_expert_num: int = 0
    mla_lora_scaling: bool = False
    router_bias: bool = False
    # muP-pretrained targets: HF computes logits = lm_head(h) / multiplier
    # (width-scaled head). We fold 1/multiplier into the loaded lm_head
    # weight once (load_target_params / TargetHead.from_pretrained) so the
    # captured last hidden stays the CANONICAL post-norm h and the frozen
    # head applies the multiplier exactly once — the reference does the same
    # fold (target_utils.py:140-153) and un-scales the serving-side capture
    # (patches/sglang/v0.5.14/spec-capture.patch LogitsProcessor hunk).
    logits_mup_width_multiplier: Optional[float] = None

    @property
    def mrope_section(self) -> Tuple[int, ...]:
        """Multimodal rope channel sections (qwen2/2.5-vl text towers)."""
        if not self.rope_scaling:
            return ()
        return tuple(self.rope_scaling.get("mrope_section") or ())

    @property
    def resolved_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    def layer_kind(self, layer_idx: int) -> str:
        if not self.layer_types:
            return "full_attention"
        return self.layer_types[layer_idx]

    def is_moe_layer(self, layer_idx: int) -> bool:
        """Per-family MoE placement: deepseek-style uses
        first_k_dense_replace (HF DeepseekV3DecoderLayer.__init__); llama4
        an explicit interleave list; qwen/gpt-oss the sparse-step/dense-list
        rule (HF Qwen3Moe)."""
        if self.num_experts <= 0:
            return False
        if self.moe_variant == "deepseek":
            return layer_idx >= self.first_k_dense_replace
        if self.moe_variant == "llama4":
            return layer_idx in self.moe_layers
        return (
            layer_idx not in self.mlp_only_layers
            and (layer_idx + 1) % max(self.decoder_sparse_step, 1) == 0
        )

    @classmethod
    def from_file(cls, path: str) -> "TargetConfig":
        with open(os.path.join(path, "config.json")) as f:
            raw = json.load(f)
        raw = raw.get("text_config", raw)
        model_type = raw.get("model_type", "llama")
        if model_type in UNSUPPORTED_MODEL_TYPES:
            raise ValueError(
                f"target architecture {model_type!r} is not supported by the "
                f"capture forward: {UNSUPPORTED_MODEL_TYPES[model_type]}. "
                "Capture its hidden states externally and ingest them via "
                "scripts/convert_ckpt_dataset.py instead."
            )
        kw: Dict[str, Any] = {}
        gemma = model_type in ("gemma3", "gemma3_text")
        if gemma:
            kw.update(
                norm_style="gemma",
                sandwich_norms=True,
                embed_scale=float(raw["hidden_size"]) ** 0.5,
                query_pre_attn_scalar=raw.get("query_pre_attn_scalar", 256),
                rope_local_base_freq=raw.get("rope_local_base_freq", 10000.0),
                attn_logit_softcapping=raw.get("attn_logit_softcapping"),
                hidden_act=raw.get(
                    "hidden_activation", "gelu_pytorch_tanh"
                ),
            )
        if model_type == "gpt_oss":
            kw.update(
                attention_sinks=True,
                moe_variant="gptoss",
                num_experts=raw.get("num_local_experts", 0) or 0,
                num_experts_per_tok=raw.get("num_experts_per_tok", 0) or 0,
                moe_intermediate_size=raw["intermediate_size"],
            )
        if model_type in ("deepseek_v2", "deepseek_v3", "kimi_k2"):
            # kimi_k2/k3 checkpoints are DeepseekV3-architecture
            v3ish = model_type != "deepseek_v2"
            kw.update(
                attn_variant="mla",
                q_lora_rank=raw.get("q_lora_rank"),
                kv_lora_rank=raw["kv_lora_rank"],
                qk_nope_head_dim=raw["qk_nope_head_dim"],
                qk_rope_head_dim=raw["qk_rope_head_dim"],
                v_head_dim=raw["v_head_dim"],
                # both families rotate INTERLEAVED channel pairs: v3 via
                # config.rope_interleave (default True), v2 via complex-pair
                # apply_rotary_emb — equivalent for attention outputs since
                # q and k share the channel permutation
                rope_interleave=raw.get("rope_interleave", True),
                mla_logit_mscale=v3ish,
                moe_variant="deepseek",
                num_experts=raw.get("n_routed_experts", 0) or 0,
                n_shared_experts=raw.get("n_shared_experts", 0) or 0,
                routed_scaling_factor=raw.get("routed_scaling_factor", 1.0),
                scoring_func=raw.get(
                    "scoring_func", "sigmoid" if v3ish else "softmax"
                ),
                topk_method=raw.get(
                    "topk_method", "noaux_tc" if v3ish else "greedy"
                ),
                n_group=raw.get("n_group", 1) or 1,
                topk_group=raw.get("topk_group", 1) or 1,
                first_k_dense_replace=raw.get("first_k_dense_replace", 0),
                num_experts_per_tok=raw.get("num_experts_per_tok", 0) or 0,
                # HF v2's gate never normalizes top-k probs (4.57 tail:
                # weights * routed_scaling_factor only)
                norm_topk_prob=raw.get("norm_topk_prob", False) and v3ish,
            )
        if model_type in ("llama4", "llama4_text"):
            n_layers = raw["num_hidden_layers"]
            step = raw.get("interleave_moe_layer_step", 1) or 1
            # HF default: a NoPE layer every no_rope_layer_interval layers
            # (Llama4TextConfig.__init__); value 1 = rope, 0 = nope
            interval = raw.get("no_rope_layer_interval", 4) or 4
            no_rope = tuple(
                raw.get("no_rope_layers")
                or (int((i + 1) % interval != 0) for i in range(n_layers))
            )
            kw.update(
                moe_variant="llama4",
                num_experts=raw.get("num_local_experts", 0) or 0,
                num_experts_per_tok=raw.get("num_experts_per_tok", 1) or 1,
                moe_layers=tuple(
                    raw.get("moe_layers")
                    or range(step - 1, n_layers, step)
                ),
                intermediate_size_mlp=raw.get("intermediate_size_mlp"),
                no_rope_layers=no_rope,
                # rope layers attend within chunks, nope layers globally
                # (Llama4TextConfig layer_types default)
                layer_types=tuple(
                    raw.get("layer_types")
                    or (
                        "chunked_attention" if r else "full_attention"
                        for r in no_rope
                    )
                ),
                attention_chunk_size=raw.get("attention_chunk_size", 8192),
                qk_l2_norm=raw.get("use_qk_norm", False),
                attn_temperature_tuning=bool(
                    raw.get("attn_temperature_tuning", False)
                ),
                attn_scale=raw.get("attn_scale", 0.1),
                floor_scale=raw.get("floor_scale", 8192.0),
                # llama4 rotates interleaved channel pairs (complex
                # apply_rotary_emb) — same common-permutation equivalence
                # as deepseek
                rope_interleave=True,
            )
        if model_type in ("qwen2_5_vl", "qwen2_vl"):
            # VL composite config: the language tower's fields live in
            # text_config (HF Qwen2_5_VLConfig); capture runs the text
            # tower — vision features enter via inputs_embeds (the
            # multimodal seam of target_capture_forward)
            text = dict(raw.get("text_config") or {})
            for key in ("vocab_size", "tie_word_embeddings"):
                if key not in text and key in raw:
                    text[key] = raw[key]
            raw = {**raw, **text} if text else raw
            model_type = f"{model_type}_text"
        if model_type == "longcat_flash":
            kw.update(
                attn_variant="mla",
                dual_sublayer=True,
                mla_lora_scaling=True,
                rope_interleave=True,
                mla_logit_mscale=True,
                q_lora_rank=raw.get("q_lora_rank"),
                kv_lora_rank=raw.get("kv_lora_rank", 512),
                qk_nope_head_dim=raw.get("qk_nope_head_dim", 128),
                qk_rope_head_dim=raw.get("qk_rope_head_dim", 64),
                v_head_dim=raw.get("v_head_dim", 128),
                moe_variant="longcat",
                num_experts=raw.get("n_routed_experts", 0) or 0,
                zero_expert_num=raw.get("zero_expert_num", 0) or 0,
                num_experts_per_tok=raw.get("moe_topk", 0) or 0,
                routed_scaling_factor=raw.get("routed_scaling_factor", 1.0),
                router_bias=raw.get("router_bias", False),
                moe_intermediate_size=raw.get("expert_ffn_hidden_size"),
            )
        if model_type == "qwen3_next":
            n_layers = raw["num_hidden_layers"]
            interval = raw.get("full_attention_interval", 4) or 4
            kw.update(
                qk_norm=True,
                attn_output_gate=True,
                shared_expert_gated=True,
                # Qwen3NextRMSNorm is zero-centered (1 + w) with the fp32
                # product before the dtype cast — gemma semantics (the
                # GDN-internal RMSNormGated is NOT, handled separately)
                norm_style="gemma",
                partial_rotary_factor=raw.get("partial_rotary_factor", 0.25),
                layer_types=tuple(
                    raw.get("layer_types")
                    or (
                        "linear_attention"
                        if (i + 1) % interval
                        else "full_attention"
                        for i in range(n_layers)
                    )
                ),
                linear_num_value_heads=raw.get("linear_num_value_heads", 32),
                linear_num_key_heads=raw.get("linear_num_key_heads", 16),
                linear_key_head_dim=raw.get("linear_key_head_dim", 128),
                linear_value_head_dim=raw.get("linear_value_head_dim", 128),
                linear_conv_kernel_dim=raw.get("linear_conv_kernel_dim", 4),
            )
        if model_type == "glm4_moe":
            kw.update(
                qk_norm=raw.get("use_qk_norm", False),
                partial_rotary_factor=raw.get("partial_rotary_factor", 0.5),
                moe_variant="deepseek",
                num_experts=raw.get("n_routed_experts", 0) or 0,
                n_shared_experts=raw.get("n_shared_experts", 0) or 0,
                routed_scaling_factor=raw.get("routed_scaling_factor", 1.0),
                scoring_func="sigmoid",
                topk_method="noaux_tc",
                n_group=raw.get("n_group", 1) or 1,
                topk_group=raw.get("topk_group", 1) or 1,
                first_k_dense_replace=raw.get("first_k_dense_replace", 0),
                num_experts_per_tok=raw.get("num_experts_per_tok", 0) or 0,
                norm_topk_prob=raw.get("norm_topk_prob", False),
            )
        defaults = dict(
            num_experts=raw.get("num_experts", 0) or 0,
            num_experts_per_tok=raw.get("num_experts_per_tok", 0) or 0,
            norm_topk_prob=raw.get("norm_topk_prob", False),
            moe_intermediate_size=raw.get("moe_intermediate_size"),
            attention_bias=raw.get(
                "attention_bias",
                model_type in ("qwen2", "qwen2_5_vl_text", "qwen2_vl_text"),
            ),
            qk_norm=model_type in ("qwen3", "qwen3_moe"),
            hidden_act=raw.get("hidden_act", "silu"),
            partial_rotary_factor=raw.get("partial_rotary_factor", 1.0),
            layer_types=tuple(raw.get("layer_types", []) or []),
            logits_mup_width_multiplier=raw.get(
                "logits_mup_width_multiplier"
            ),
        )
        defaults.update(kw)
        return cls(
            vocab_size=raw["vocab_size"],
            hidden_size=raw["hidden_size"],
            # longcat names the dense-MLP width ffn_hidden_size
            intermediate_size=(
                raw.get("intermediate_size") or raw["ffn_hidden_size"]
            ),
            # longcat's num_hidden_layers counts MLA sublayers (2× the
            # decoder's logical num_layers — HF LongcatFlashModel.__init__)
            num_hidden_layers=(
                raw["num_layers"]
                if model_type == "longcat_flash"
                else raw["num_hidden_layers"]
            ),
            num_attention_heads=raw["num_attention_heads"],
            num_key_value_heads=raw.get(
                "num_key_value_heads", raw["num_attention_heads"]
            ),
            head_dim=raw.get("head_dim"),
            # HF to_diff_dict omits default-valued keys; llama4's RMSNorm
            # default eps is 1e-5, the others 1e-6
            rms_norm_eps=raw.get(
                "rms_norm_eps",
                1e-5 if model_type in ("llama4", "llama4_text") else 1e-6,
            ),
            rope_theta=raw.get("rope_theta", 10000.0),
            rope_scaling=raw.get("rope_scaling"),
            max_position_embeddings=raw.get("max_position_embeddings", 32768),
            tie_word_embeddings=raw.get("tie_word_embeddings", False),
            model_type=model_type,
            decoder_sparse_step=raw.get("decoder_sparse_step", 1) or 1,
            mlp_only_layers=tuple(raw.get("mlp_only_layers", []) or []),
            sliding_window=raw.get("sliding_window"),
            **defaults,
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

    # VL composite checkpoints: the text tower lives under
    # model.language_model.* (vision under model.visual.*, not captured)
    vl_text = config.model_type in ("qwen2_5_vl_text", "qwen2_vl_text")

    def canonical(key: str) -> Optional[str]:
        if vl_text:
            if key.startswith("model.visual."):
                return None
            if key.startswith("model.language_model."):
                return "model." + key[len("model.language_model."):]
        return key

    wanted_prefixes = ("model.", "lm_head.")
    by_shard: Dict[str, List[str]] = {}
    for key, shard in key_to_shard.items():
        if key.startswith(wanted_prefixes) and canonical(key) is not None:
            by_shard.setdefault(shard, []).append(key)

    params: Dict[str, jnp.ndarray] = {}
    for shard, keys in sorted(by_shard.items()):
        with safe_open(os.path.join(path, shard), framework="numpy") as f:
            for key in keys:
                arr = f.get_tensor(key)
                name = canonical(key)
                if np.issubdtype(arr.dtype, np.floating) or str(
                    arr.dtype
                ) == "bfloat16":
                    params[name] = jnp.asarray(arr).astype(dtype)
                else:
                    params[name] = jnp.asarray(arr)
    if config.tie_word_embeddings and "lm_head.weight" not in params:
        params["lm_head.weight"] = params["model.embed_tokens.weight"]
    mup = config.logits_mup_width_multiplier
    if mup:
        # fold the muP width scale into the head ONCE at load: logits are
        # lm_head(h) / mup in the HF forward, and the captured last hidden
        # stays the canonical post-norm h (see TargetConfig field comment)
        if config.tie_word_embeddings:
            raise ValueError(
                "cannot fold logits_mup_width_multiplier into a tied "
                "embedding/lm_head (the fold would corrupt the embedding)"
            )
        params["lm_head.weight"] = params["lm_head.weight"] / float(mup)
    return params


def _rms(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(var + eps)
    return weight.astype(dtype) * x32.astype(dtype)


def _rms_gemma(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Gemma RMSNorm: zero-centered weight, fp32 product THEN the dtype cast
    (HF Gemma3RMSNorm — llama casts before multiplying)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(var + eps)
    return (x32 * (1.0 + weight.astype(jnp.float32))).astype(dtype)


def _norm(cfg: "TargetConfig", x, weight):
    if cfg.norm_style == "gemma":
        return _rms_gemma(x, weight, cfg.rms_norm_eps)
    return _rms(x, weight, cfg.rms_norm_eps)


def _l2norm(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Weightless RMS normalization (llama4 qk norm, HF Llama4TextL2Norm)."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _interleave_to_half(x: jnp.ndarray) -> jnp.ndarray:
    """Reorder interleaved rope channels (x0,y0,x1,y1,…) to half layout
    (x0,x1,…,y0,y1,…) — HF apply_rotary_pos_emb_interleave's view/transpose
    (deepseek_v3 rope_interleave=True)."""
    *lead, d = x.shape
    return x.reshape(*lead, d // 2, 2).swapaxes(-1, -2).reshape(*lead, d)


def _apply_partial_rope(q, k, cos, sin, rot_dim: int, interleave: bool):
    """Rope on the first ``rot_dim`` channels only (glm4_moe/phi partial
    rotary); optional interleaved-weight reorder first (deepseek_v3)."""
    if interleave:
        q_r, k_r = _interleave_to_half(q[..., :rot_dim]), _interleave_to_half(
            k[..., :rot_dim]
        )
    else:
        q_r, k_r = q[..., :rot_dim], k[..., :rot_dim]
    q_r, k_r = apply_rope(q_r, k_r, cos, sin)
    if rot_dim == q.shape[-1]:
        return q_r, k_r
    return (
        jnp.concatenate([q_r, q[..., rot_dim:]], axis=-1),
        jnp.concatenate([k_r, k[..., rot_dim:]], axis=-1),
    )


def _act(name: str):
    return {"silu": jax.nn.silu, "gelu": jax.nn.gelu,
            "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True)}[
        name
    ]


def _attend(q, k, v, bias, scale, *, sinks=None, softcap=None):
    """Grouped-query softmax attention core. q [B,H,S,Dq], k [B,KVH,S,Dq],
    v [B,KVH,S,Dv], bias [B,1,S,S] additive fp32 mask. ``sinks``: [H]
    learned per-head sink logits appended as one extra softmax column and
    dropped from the probabilities (gpt-oss, HF eager_attention_forward).
    ``softcap``: tanh logit cap (gemma attn_logit_softcapping)."""
    b, h, s, dq = q.shape
    kvh = k.shape[1]
    g = h // kvh
    qg = q.reshape(b, kvh, g, s, dq)
    w = jnp.einsum(
        "bkgsd,bktd->bkgst", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if softcap:
        w = jnp.tanh(w / softcap) * softcap
    w = w + bias[:, :, None].astype(jnp.float32)
    if sinks is not None:
        sink = jnp.broadcast_to(
            sinks.astype(jnp.float32).reshape(1, kvh, g, 1, 1),
            (b, kvh, g, s, 1),
        )
        w = jnp.concatenate([w, sink], axis=-1)
        p = jax.nn.softmax(w, axis=-1)[..., :-1].astype(v.dtype)
    else:
        p = jax.nn.softmax(w, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bkgst,bktd->bkgsd", p, v)
    dv = v.shape[-1]
    return attn.reshape(b, h, s, dv).transpose(0, 2, 1, 3).reshape(
        b, s, h * dv
    )


def _linear(params, key, val):
    out = val @ params[f"{key}.weight"].T
    bias_key = f"{key}.bias"
    if bias_key in params:
        out = out + params[bias_key]
    return out


def _std_attention(params, cfg: "TargetConfig", prefix: str, y, bias,
                   cos, sin, layer_idx: int = 0):
    """Standard GQA attention covering llama/qwen/phi/gemma3/gpt-oss/llama4:
    fused qkv (phi3 qkv_proj) or separate projections, per-head q/k RMSNorm
    (qwen3/gemma3) or L2 norm (llama4), partial/interleaved/skipped rotary,
    query_pre_attn_scalar (gemma3), nope-layer temperature tuning (llama4),
    sinks (gpt-oss), logit softcap."""
    b, s, _ = y.shape
    d = cfg.resolved_head_dim
    h, kvh = cfg.num_attention_heads, cfg.num_key_value_heads
    ap = f"{prefix}.self_attn"
    out_gate = None
    if f"{ap}.qkv_proj.weight" in params:  # phi3 fused projection
        qkv = _linear(params, f"{ap}.qkv_proj", y)
        q, k, v = jnp.split(qkv, [h * d, h * d + kvh * d], axis=-1)
    elif cfg.attn_output_gate:
        # qwen3_next: q_proj emits per-head (query, output-gate) halves
        # (HF Qwen3NextAttention.forward chunk-by-head)
        qg = _linear(params, f"{ap}.q_proj", y).reshape(b, s, h, 2 * d)
        q, out_gate = jnp.split(qg, 2, axis=-1)
        out_gate = out_gate.reshape(b, s, h * d)
        q = q.reshape(b, s, h * d)
        k = _linear(params, f"{ap}.k_proj", y)
        v = _linear(params, f"{ap}.v_proj", y)
    else:
        q = _linear(params, f"{ap}.q_proj", y)
        k = _linear(params, f"{ap}.k_proj", y)
        v = _linear(params, f"{ap}.v_proj", y)
    q = q.reshape(b, s, h, d)
    k = k.reshape(b, s, kvh, d)
    v = v.reshape(b, s, kvh, d)
    if cfg.qk_norm or cfg.norm_style == "gemma":
        q = _norm(cfg, q, params[f"{ap}.q_norm.weight"])
        k = _norm(cfg, k, params[f"{ap}.k_norm.weight"])
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    use_rope = (
        bool(cfg.no_rope_layers[layer_idx]) if cfg.no_rope_layers else True
    )
    if use_rope and cos.ndim == 4:
        # multimodal 3-axis rope (qwen2.5-vl text tower): cos/sin
        # [3, B, S, D], channel chunks select axes by mrope_section
        from specforge_tpu.ops.rope import apply_multimodal_rope

        q, k = apply_multimodal_rope(q, k, cos, sin, cfg.mrope_section)
    elif use_rope:
        rot_dim = cos.shape[-1]
        q, k = _apply_partial_rope(
            q, k, cos, sin, rot_dim, interleave=cfg.rope_interleave
        )
        if cfg.qk_l2_norm:  # llama4: weightless L2 norm AFTER rope
            q = _l2norm(q, cfg.rms_norm_eps)
            k = _l2norm(k, cfg.rms_norm_eps)
    elif cfg.attn_temperature_tuning:
        # llama4 nope layers: per-position query temperature
        # (HF Llama4TextAttention.forward, arXiv:2501.19399)
        pos = jnp.arange(s, dtype=jnp.float32)
        scales = (
            jnp.log1p(jnp.floor((pos + 1.0) / cfg.floor_scale))
            * cfg.attn_scale + 1.0
        )
        q = (q * scales[None, None, :, None]).astype(q.dtype)
    scale = (
        cfg.query_pre_attn_scalar ** -0.5
        if cfg.query_pre_attn_scalar is not None
        else d ** -0.5
    )
    sinks = params.get(f"{ap}.sinks") if cfg.attention_sinks else None
    attn = _attend(
        q, k, v, bias, scale, sinks=sinks,
        softcap=cfg.attn_logit_softcapping,
    )
    if out_gate is not None:
        attn = attn * jax.nn.sigmoid(out_gate)
    return _linear(params, f"{ap}.o_proj", attn)


def _mla_attention(params, cfg: "TargetConfig", prefix: str, y, bias,
                   cos, sin, ap: Optional[str] = None):
    """Multi-head latent attention (deepseek v2/v3, kimi, longcat): low-rank
    q (optional), compressed kv latent + shared rope key, per-head nope/rope
    split — HF DeepseekV3Attention.forward. ``ap`` overrides the attention
    module path (longcat's dual sublayers index self_attn.{0,1}).
    ``cfg.mla_lora_scaling``: longcat rescales the LoRA outputs by
    sqrt(hidden/rank) (HF LongcatFlashMLA mla_scale_{q,kv}_lora)."""
    b, s, _ = y.shape
    heads = cfg.num_attention_heads
    nope, rope = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
    qk_dim = nope + rope
    vd = cfg.v_head_dim
    ap = ap or f"{prefix}.self_attn"

    # the LoRA layernorms use the RMSNorm class default eps (1e-6), NOT
    # config.rms_norm_eps (HF builds them without passing eps — matters for
    # longcat whose decoder norms use 1e-5)
    lora_eps = 1e-6
    if cfg.q_lora_rank:
        qa = _linear(params, f"{ap}.q_a_proj", y)
        qa = _rms(qa, params[f"{ap}.q_a_layernorm.weight"], lora_eps)
        q = _linear(params, f"{ap}.q_b_proj", qa)
    else:
        q = _linear(params, f"{ap}.q_proj", y)
    q = q.reshape(b, s, heads, qk_dim).transpose(0, 2, 1, 3)
    if cfg.mla_lora_scaling and cfg.q_lora_rank:
        q = q * (cfg.hidden_size / cfg.q_lora_rank) ** 0.5
    q_pass, q_rot = q[..., :nope], q[..., nope:]

    ckv = _linear(params, f"{ap}.kv_a_proj_with_mqa", y)
    k_pass, k_rot = ckv[..., : cfg.kv_lora_rank], ckv[..., cfg.kv_lora_rank:]
    k_pass = _rms(
        k_pass, params[f"{ap}.kv_a_layernorm.weight"], lora_eps
    )
    if cfg.mla_lora_scaling:
        k_pass = k_pass * (cfg.hidden_size / cfg.kv_lora_rank) ** 0.5
    kv = _linear(params, f"{ap}.kv_b_proj", k_pass)
    kv = kv.reshape(b, s, heads, nope + vd).transpose(0, 2, 1, 3)
    k_pass, v = kv[..., :nope], kv[..., nope:]
    k_rot = k_rot.reshape(b, 1, s, rope)

    q_rot, k_rot = _apply_partial_rope(
        q_rot, k_rot, cos, sin, rope, interleave=cfg.rope_interleave
    )
    k_rot = jnp.broadcast_to(k_rot, (b, heads, s, rope))
    q = jnp.concatenate([q_pass, q_rot], axis=-1)
    k = jnp.concatenate([k_pass, k_rot], axis=-1)

    scale = qk_dim ** -0.5
    if cfg.mla_logit_mscale and cfg.rope_scaling:
        mscale_all_dim = cfg.rope_scaling.get("mscale_all_dim", 0)
        factor = cfg.rope_scaling.get("factor", 1.0)
        if mscale_all_dim:
            import math as _math

            m = (
                0.1 * mscale_all_dim * _math.log(factor) + 1.0
                if factor > 1 else 1.0
            )
            scale = scale * m * m
    attn = _attend(q, k, v, bias, scale)
    return _linear(params, f"{ap}.o_proj", attn)


def _chunk_gated_delta_rule(q, k, v, g, beta, chunk_size: int = 64):
    """Chunked gated delta rule (HF torch_chunk_gated_delta_rule), computed
    the TPU way: the reference's in-chunk sequential forward substitution
    becomes one unit-lower-triangular solve per chunk (batched
    ``solve_triangular`` — MXU-friendly, no per-row Python loop), and the
    cross-chunk recurrence is a ``lax.scan`` carrying the [dk, dv] state.

    q/k [B,S,H,dk], v [B,S,H,dv], g/beta [B,S,H]. fp32 compute (the
    reference kernel casts everything to float32). Returns [B,S,H,dv].
    """
    in_dtype = v.dtype

    def _l2(x):  # FLA l2norm: sum-of-squares (NOT rms)
        x = x.astype(jnp.float32)
        return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-6)

    # [B,H,S,*] fp32
    q = _l2(q).transpose(0, 2, 1, 3)
    k = _l2(k).transpose(0, 2, 1, 3)
    v = v.astype(jnp.float32).transpose(0, 2, 1, 3)
    g = g.astype(jnp.float32).transpose(0, 2, 1)
    beta = beta.astype(jnp.float32).transpose(0, 2, 1)
    b, h, s, dk = k.shape
    dv = v.shape[-1]
    c = min(chunk_size, s)
    pad = (-s) % c
    nc = (s + pad) // c
    if pad:
        q, k, v = (
            jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0))) for x in (q, k, v)
        )
        g, beta = (
            jnp.pad(x, ((0, 0), (0, 0), (0, pad))) for x in (g, beta)
        )
    q = q * (dk ** -0.5)
    v_beta = v * beta[..., None]
    k_beta = k * beta[..., None]
    q, k, v_beta, k_beta = (
        x.reshape(b, h, nc, c, x.shape[-1]) for x in (q, k, v_beta, k_beta)
    )
    g = jnp.cumsum(g.reshape(b, h, nc, c), axis=-1)

    lower = jnp.tril(jnp.ones((c, c), bool))
    strict = jnp.tril(jnp.ones((c, c), bool), -1)
    gd = g[..., :, None] - g[..., None, :]
    decay = jnp.where(lower, jnp.exp(jnp.where(lower, gd, 0.0)), 0.0)
    # in-chunk mixing matrix: the reference builds T = (I - A)^{-1} row by
    # row with A = -(Kβ Kᵀ · decay) strictly lower; (I - A) is unit lower
    # triangular, so one triangular solve per chunk replaces the loop
    a_strict = jnp.where(
        strict,
        jnp.einsum(
            "bhncd,bhned->bhnce", k_beta, k,
            preferred_element_type=jnp.float32,
        ) * decay,
        0.0,
    )
    m_mat = jnp.eye(c, dtype=jnp.float32) + a_strict
    from jax.scipy.linalg import solve_triangular

    u = solve_triangular(m_mat, v_beta, lower=True, unit_diagonal=True)
    w = solve_triangular(
        m_mat, k_beta * jnp.exp(g)[..., None], lower=True, unit_diagonal=True
    )

    def body(state, xs):
        q_i, k_i, u_i, w_i, g_i, decay_i = xs
        attn = jnp.where(
            lower,
            jnp.einsum(
                "bhcd,bhed->bhce", q_i, k_i,
                preferred_element_type=jnp.float32,
            ) * decay_i,
            0.0,
        )
        v_new = u_i - jnp.einsum("bhck,bhkv->bhcv", w_i, state)
        out_i = (
            jnp.einsum(
                "bhck,bhkv->bhcv", q_i * jnp.exp(g_i)[..., None], state
            )
            + jnp.einsum("bhce,bhev->bhcv", attn, v_new)
        )
        g_last = g_i[..., -1]
        kd = k_i * jnp.exp(g_last[..., None] - g_i)[..., None]
        state = state * jnp.exp(g_last)[..., None, None] + jnp.einsum(
            "bhck,bhcv->bhkv", kd, v_new
        )
        return state, out_i

    xs = tuple(jnp.moveaxis(x, 2, 0) for x in (q, k, u, w, g, decay))
    state0 = jnp.zeros((b, h, dk, dv), jnp.float32)
    _, outs = jax.lax.scan(body, state0, xs)
    out = jnp.moveaxis(outs, 0, 2).reshape(b, h, nc * c, dv)[:, :, :s]
    return out.transpose(0, 2, 1, 3).astype(in_dtype)


def _gdn_attention(params, cfg: "TargetConfig", prefix: str, y,
                   token_valid):
    """Gated-DeltaNet linear attention layer (qwen3_next, HF
    Qwen3NextGatedDeltaNet.forward): fused qkvz/ba projections in per-key-
    head interleaved layout, causal depthwise conv + silu over (q,k,v),
    chunked gated delta rule, gated RMS norm (norm before gate), out
    projection. Padding tokens are zeroed on entry (HF
    apply_mask_to_padding_states); with right padding the recurrent state
    past a sequence's end never feeds a valid position."""
    b, s, _ = y.shape
    nk, nv = cfg.linear_num_key_heads, cfg.linear_num_value_heads
    dk, dv = cfg.linear_key_head_dim, cfg.linear_value_head_dim
    key_dim, value_dim = nk * dk, nv * dv
    r = nv // nk
    ap = f"{prefix}.linear_attn"
    if token_valid is not None:
        y = y * token_valid[..., None].astype(y.dtype)
    qkvz = _linear(params, f"{ap}.in_proj_qkvz", y).reshape(
        b, s, nk, 2 * dk + 2 * r * dv
    )
    ba = _linear(params, f"{ap}.in_proj_ba", y).reshape(b, s, nk, 2 * r)
    q = qkvz[..., :dk].reshape(b, s, key_dim)
    k = qkvz[..., dk:2 * dk].reshape(b, s, key_dim)
    v = qkvz[..., 2 * dk:2 * dk + r * dv].reshape(b, s, value_dim)
    z = qkvz[..., 2 * dk + r * dv:].reshape(b, s, nv, dv)
    bg = ba[..., :r].reshape(b, s, nv)
    a = ba[..., r:].reshape(b, s, nv)

    # causal depthwise conv over time + silu (HF conv1d groups=conv_dim,
    # left-pad K-1 ≡ torch's symmetric pad + truncate-to-seq_len)
    mixed = jnp.concatenate([q, k, v], axis=-1)          # [B, S, conv_dim]
    w = params[f"{ap}.conv1d.weight"]                    # [conv_dim, 1, K]
    ksz = w.shape[-1]
    conv_dim = 2 * key_dim + value_dim
    lhs = jnp.pad(mixed, ((0, 0), (ksz - 1, 0), (0, 0))).transpose(0, 2, 1)
    conv = jax.lax.conv_general_dilated(
        lhs, w.astype(lhs.dtype), window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=conv_dim,
    )
    mixed = jax.nn.silu(conv).transpose(0, 2, 1)
    q, k, v = jnp.split(mixed, [key_dim, 2 * key_dim], axis=-1)
    q = q.reshape(b, s, nk, dk)
    k = k.reshape(b, s, nk, dk)
    v = v.reshape(b, s, nv, dv)
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)

    beta = jax.nn.sigmoid(bg.astype(jnp.float32))
    g = -jnp.exp(params[f"{ap}.A_log"].astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + params[f"{ap}.dt_bias"].astype(jnp.float32)
    )
    core = _chunk_gated_delta_rule(q, k, v, g, beta)     # [B, S, nv, dv]

    # gated RMS norm: normalize, weight, THEN silu(z) gate (HF
    # Qwen3NextRMSNormGated "norm before gate")
    c32 = core.astype(jnp.float32)
    var = jnp.mean(c32 * c32, axis=-1, keepdims=True)
    normed = params[f"{ap}.norm.weight"].astype(jnp.float32) * (
        c32 * jax.lax.rsqrt(var + cfg.rms_norm_eps)
    )
    gated = (normed * jax.nn.silu(z.astype(jnp.float32))).astype(y.dtype)
    return _linear(params, f"{ap}.out_proj", gated.reshape(b, s, value_dim))


def _dense_mlp(params, cfg: "TargetConfig", prefix: str, y):
    """Dense MLP: separate gate/up or phi3 fused gate_up_proj (gate is the
    FIRST half — HF Phi3MLP chunk order)."""
    act = _act(cfg.hidden_act)
    if f"{prefix}.gate_up_proj.weight" in params:
        gu = _linear(params, f"{prefix}.gate_up_proj", y)
        gate, up = jnp.split(gu, 2, axis=-1)
    else:
        gate = _linear(params, f"{prefix}.gate_proj", y)
        up = _linear(params, f"{prefix}.up_proj", y)
    return _linear(params, f"{prefix}.down_proj", act(gate) * up)


def _sort_assignments(top_w, top_i, num_experts: int):
    """Sort flattened (token, expert) assignments by expert id (stable).
    Returns (order, token_of, expert_of_sorted, sorted_weight, group_sizes)."""
    t, k = top_i.shape
    m = t * k
    flat_expert = top_i.reshape(m)
    flat_weight = top_w.reshape(m)
    order = jnp.argsort(flat_expert)
    token_of = order // k
    expert_of = jnp.take(flat_expert, order)
    group_sizes = (
        jnp.zeros((num_experts,), jnp.int32).at[flat_expert].add(1, mode="drop")
    )
    return order, token_of, expert_of, jnp.take(flat_weight, order), group_sizes


def _expert_mix_gathered(xs_tokens, top_w, top_i, num_experts,
                         expert_fn, *, scale_inputs: bool = False):
    """Generic gather-by-expert mix: sort assignments, run ``expert_fn``
    (grouped compute over the sorted rows) and scatter-add weighted outputs.
    ``expert_fn(rows, expert_of, group_sizes) -> rows_out``.
    ``scale_inputs``: apply the routing weight to the expert INPUT instead
    of the output — llama4's semantics (the weight passes through the
    nonlinearity, HF Llama4TextMoe.forward scales routed_in)."""
    t, h = xs_tokens.shape
    order, token_of, expert_of, w_sorted, group_sizes = _sort_assignments(
        top_w, top_i, num_experts
    )
    rows = jnp.take(xs_tokens, token_of, axis=0)
    if scale_inputs:
        rows = rows * w_sorted[:, None].astype(rows.dtype)
    out_rows = expert_fn(rows, expert_of, group_sizes)
    if not scale_inputs:
        out_rows = out_rows * w_sorted[:, None].astype(out_rows.dtype)
    return jnp.zeros((t, h), out_rows.dtype).at[token_of].add(out_rows)


def _deepseek_route(params, cfg: "TargetConfig", prefix: str, x32):
    return _deepseek_route_w(
        params[f"{prefix}.mlp.gate.weight"],
        params.get(f"{prefix}.mlp.gate.e_score_correction_bias"),
        cfg, x32,
    )


def _deepseek_route_w(gate_w, correction_bias, cfg: "TargetConfig", x32):
    """Deepseek v2/v3 router (HF DeepseekV2MoEGate / DeepseekV3TopkRouter):
    fp32 scores (softmax v2 / sigmoid v3), optional group-limited selection,
    v3 noaux_tc correction bias for CHOICE only, norm_topk_prob, then
    routed_scaling_factor. Weight-leaf form so the EP path can close over
    just the routing leaves inside ``shard_map``."""
    e, k = cfg.num_experts, cfg.num_experts_per_tok
    logits = x32 @ gate_w.astype(jnp.float32).T
    if cfg.scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)

    if cfg.topk_method == "noaux_tc":
        correction = (
            jnp.zeros((e,), jnp.float32) if correction_bias is None
            else correction_bias.astype(jnp.float32)
        )
        choice = scores + correction
        grp = choice.reshape(-1, cfg.n_group, e // cfg.n_group)
        group_scores = jnp.sum(jax.lax.top_k(grp, 2)[0], axis=-1)
    elif cfg.topk_method == "group_limited_greedy":
        choice = scores
        grp = choice.reshape(-1, cfg.n_group, e // cfg.n_group)
        group_scores = jnp.max(grp, axis=-1)
    else:  # greedy
        top_w, top_i = jax.lax.top_k(scores, k)
        if cfg.norm_topk_prob and k > 1:
            top_w = top_w / (jnp.sum(top_w, axis=-1, keepdims=True) + 1e-20)
        return top_w * cfg.routed_scaling_factor, top_i

    _, group_idx = jax.lax.top_k(group_scores, cfg.topk_group)
    group_mask = jnp.sum(
        jax.nn.one_hot(group_idx, cfg.n_group, dtype=jnp.float32), axis=-2
    )
    score_mask = jnp.repeat(group_mask, e // cfg.n_group, axis=-1)
    masked_choice = jnp.where(score_mask > 0, choice, 0.0)
    _, top_i = jax.lax.top_k(masked_choice, k)
    # weights come from the UNCORRECTED scores at the chosen indices
    top_w = jnp.take_along_axis(scores, top_i, axis=-1)
    if cfg.norm_topk_prob and k > 1:
        top_w = top_w / (jnp.sum(top_w, axis=-1, keepdims=True) + 1e-20)
    return top_w * cfg.routed_scaling_factor, top_i


def _moe_deepseek(params, cfg: "TargetConfig", prefix: str, y):
    """Deepseek-style MoE layer: routed experts (ragged grouped matmuls)
    + always-on shared experts (HF DeepseekV3MoE.forward)."""
    b, s, h = y.shape
    t = b * s
    x = y.reshape(t, h)
    e = cfg.num_experts
    top_w, top_i = _deepseek_route(
        params, cfg, prefix, x.astype(jnp.float32)
    )
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

    def expert_fn(rows, expert_of, group_sizes):
        g = jax.lax.ragged_dot(rows, gate_w, group_sizes)
        u = jax.lax.ragged_dot(rows, up_w, group_sizes)
        return jax.lax.ragged_dot(
            (act(g) * u).astype(rows.dtype), down_w, group_sizes
        )

    routed = _expert_mix_gathered(x, top_w, top_i, e, expert_fn)
    out = routed.reshape(b, s, h).astype(y.dtype)
    if cfg.n_shared_experts:
        out = out + _dense_mlp(params, cfg, f"{prefix}.mlp.shared_experts", y)
    return out


def _moe_gptoss(params, cfg: "TargetConfig", prefix: str, y):
    """gpt-oss MoE: biased router (softmax over the top-k logits), fused
    expert tensors with interleaved gate/up and clamp-swiglu activation
    (HF GptOssTopKRouter + GptOssExperts)."""
    b, s, h = y.shape
    t = b * s
    x = y.reshape(t, h)
    e, k = cfg.num_experts, cfg.num_experts_per_tok
    logits = (
        x @ params[f"{prefix}.mlp.router.weight"].T
        + params[f"{prefix}.mlp.router.bias"]
    )
    top_v, top_i = jax.lax.top_k(logits, k)
    top_w = jax.nn.softmax(top_v, axis=-1)

    gate_up_w = params[f"{prefix}.mlp.experts.gate_up_proj"]      # [E, h, 2i]
    gate_up_b = params[f"{prefix}.mlp.experts.gate_up_proj_bias"]  # [E, 2i]
    down_w = params[f"{prefix}.mlp.experts.down_proj"]             # [E, i, h]
    down_b = params[f"{prefix}.mlp.experts.down_proj_bias"]        # [E, h]
    alpha, limit = cfg.moe_alpha, cfg.moe_limit

    def expert_fn(rows, expert_of, group_sizes):
        gu = jax.lax.ragged_dot(rows, gate_up_w, group_sizes)
        gu = gu + jnp.take(gate_up_b, expert_of, axis=0)
        gate, up = gu[..., ::2], gu[..., 1::2]
        gate = jnp.minimum(gate, limit)
        up = jnp.clip(up, -limit, limit)
        glu = gate * jax.nn.sigmoid(gate * alpha)
        inner = ((up + 1.0) * glu).astype(rows.dtype)
        out = jax.lax.ragged_dot(inner, down_w, group_sizes)
        return out + jnp.take(down_b, expert_of, axis=0)

    routed = _expert_mix_gathered(x, top_w, top_i, e, expert_fn)
    return routed.reshape(b, s, h).astype(y.dtype)


def _moe_llama4(params, cfg: "TargetConfig", prefix: str, y):
    """llama4 MoE: top-k router with sigmoid'd logits as weights applied to
    the expert INPUTS, fused chunked gate_up experts, always-on shared
    expert (HF Llama4TextMoe/Llama4TextExperts)."""
    b, s, h = y.shape
    t = b * s
    x = y.reshape(t, h)
    e, k = cfg.num_experts, cfg.num_experts_per_tok
    fp = f"{prefix}.feed_forward"
    logits = x @ params[f"{fp}.router.weight"].T
    top_v, top_i = jax.lax.top_k(logits, k)
    top_w = jax.nn.sigmoid(top_v.astype(jnp.float32)).astype(x.dtype)

    gate_up_w = params[f"{fp}.experts.gate_up_proj"]  # [E, h, 2i]
    down_w = params[f"{fp}.experts.down_proj"]        # [E, i, h]
    act = _act(cfg.hidden_act)

    def expert_fn(rows, expert_of, group_sizes):
        gu = jax.lax.ragged_dot(rows, gate_up_w, group_sizes)
        gate, up = jnp.split(gu, 2, axis=-1)  # chunk(2), not interleaved
        return jax.lax.ragged_dot(
            (up * act(gate)).astype(rows.dtype), down_w, group_sizes
        )

    routed = _expert_mix_gathered(
        x, top_w, top_i, e, expert_fn, scale_inputs=True
    )
    out = routed.reshape(b, s, h).astype(y.dtype)
    return out + _dense_mlp(params, cfg, f"{fp}.shared_expert", y)


def _moe_longcat(params, cfg: "TargetConfig", prefix: str, y):
    """longcat shortcut MoE: softmax router over routed + zero-computation
    experts with a correction bias for CHOICE only (weights from the
    uncorrected scores), identity experts contribute weight × input (HF
    LongcatFlashTopkRouter / LongcatFlashMoE)."""
    b, s, h = y.shape
    t = b * s
    x = y.reshape(t, h)
    e, z, k = cfg.num_experts, cfg.zero_expert_num, cfg.num_experts_per_tok
    rp = f"{prefix}.mlp.router"
    logits = x.astype(jnp.float32) @ params[
        f"{rp}.classifier.weight"
    ].astype(jnp.float32).T
    if cfg.router_bias:
        logits = logits + params[f"{rp}.classifier.bias"].astype(jnp.float32)
    scores = jax.nn.softmax(logits, axis=-1)
    choice = scores + params.get(
        f"{rp}.e_score_correction_bias", jnp.zeros((e + z,), jnp.float32)
    ).astype(jnp.float32)
    _, top_i = jax.lax.top_k(choice, k)
    top_w = jnp.take_along_axis(scores, top_i, axis=-1) * (
        cfg.routed_scaling_factor
    )

    # zero-computation experts (id >= e): identity × routing weight
    id_w = jnp.sum(jnp.where(top_i >= e, top_w, 0.0), axis=-1)
    out = x.astype(jnp.float32) * id_w[:, None]

    # routed experts: sentinel id e drops identity assignments from the
    # grouped compute; their (zeroed) weights kill any residual rows
    routed_w = jnp.where(top_i < e, top_w, 0.0)
    routed_i = jnp.minimum(top_i, e)
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

    def expert_fn(rows, expert_of, group_sizes):
        g = jax.lax.ragged_dot(rows, gate_w, group_sizes)
        u = jax.lax.ragged_dot(rows, up_w, group_sizes)
        return jax.lax.ragged_dot(
            (act(g) * u).astype(rows.dtype), down_w, group_sizes
        )

    routed = _expert_mix_gathered(x, routed_w, routed_i, e, expert_fn)
    return (out + routed.astype(jnp.float32)).reshape(b, s, h).astype(y.dtype)


def _longcat_layer(params, cfg: "TargetConfig", prefix: str, x, bias,
                   cos, sin):
    """One longcat logical layer (HF LongcatFlashDecoderLayer): two
    MLA+dense-MLP sublayers with a shortcut MoE computed on the FIRST
    post-attention norm output and added after the SECOND MLP."""
    shortcut = None
    for j in (0, 1):
        residual = x
        y = _norm(cfg, x, params[f"{prefix}.input_layernorm.{j}.weight"])
        attn = _mla_attention(
            params, cfg, prefix, y, bias, cos, sin,
            ap=f"{prefix}.self_attn.{j}",
        )
        x = residual + attn
        residual = x
        y = _norm(
            cfg, x, params[f"{prefix}.post_attention_layernorm.{j}.weight"]
        )
        if j == 0:
            shortcut = _moe_longcat(params, cfg, prefix, y)
            x = residual + _dense_mlp(params, cfg, f"{prefix}.mlps.0", y)
        else:
            x = residual + _dense_mlp(
                params, cfg, f"{prefix}.mlps.1", y
            ) + shortcut
    return x


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
    top_w, top_i = _moe_route_w(router_weight, cfg, x)
    return _assignments_from(
        top_w, top_i, cfg.num_experts, cfg.num_experts_per_tok, token_valid
    )


def _assignments_from(top_w, top_i, e: int, k: int, token_valid=None):
    """Sorted-assignment machinery shared by every router variant: see
    ``_moe_assignments``."""
    t = top_i.shape[0]
    m = t * k
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
        if cfg.moe_variant == "gptoss":
            # gpt-oss ships fused [E, ...] expert tensors already — no
            # restacking, just shard the expert dim over ep_axis
            for name in ("gate_up_proj", "gate_up_proj_bias",
                         "down_proj", "down_proj_bias"):
                key = f"{prefix}.mlp.experts.{name}"
                if ns is not None and key in out:
                    out[key] = jax.device_put(out[key], ns)
            continue
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

    act = _act(cfg.hidden_act)
    variant = cfg.moe_variant

    # per-variant routing (replicated leaves) + windowed expert compute
    # (ep-sharded leaves). The window/capacity/overflow machinery below is
    # variant-free.
    if variant == "qwen":
        route_leaves = (params[f"{prefix}.mlp.gate.weight"],)

        def route_fn(x, leaves):
            return _moe_route_w(leaves[0], cfg, x)

    elif variant == "deepseek":
        corr = params.get(f"{prefix}.mlp.gate.e_score_correction_bias")
        route_leaves = (
            params[f"{prefix}.mlp.gate.weight"],
            jnp.zeros((e,), jnp.float32) if corr is None else corr,
        )

        def route_fn(x, leaves):
            return _deepseek_route_w(
                leaves[0], leaves[1], cfg, x.astype(jnp.float32)
            )

    elif variant == "gptoss":
        route_leaves = (
            params[f"{prefix}.mlp.router.weight"],
            params[f"{prefix}.mlp.router.bias"],
        )

        def route_fn(x, leaves):
            logits = x @ leaves[0].T + leaves[1]
            top_v, top_i = jax.lax.top_k(logits, k)
            return jax.nn.softmax(top_v, axis=-1), top_i

    else:
        raise ValueError(
            f"moe_impl='ep' supports qwen/deepseek/gptoss MoE variants "
            f"(got {variant!r})"
        )

    if variant == "gptoss":
        weight_leaves = (
            params[f"{prefix}.mlp.experts.gate_up_proj"],       # [E, h, 2i]
            params[f"{prefix}.mlp.experts.gate_up_proj_bias"],  # [E, 2i]
            params[f"{prefix}.mlp.experts.down_proj"],          # [E, i, h]
            params[f"{prefix}.mlp.experts.down_proj_bias"],     # [E, h]
        )
        alpha, limit = cfg.moe_alpha, cfg.moe_limit

        def expert_fn(window, gsz, leaves, local_eid):
            guw, gub, dw, db = leaves
            gu = jax.lax.ragged_dot(window, guw, gsz)
            gu = gu + jnp.take(gub, local_eid, axis=0)
            gate, up = gu[..., ::2], gu[..., 1::2]
            gate = jnp.minimum(gate, limit)
            up = jnp.clip(up, -limit, limit)
            glu = gate * jax.nn.sigmoid(gate * alpha)
            out = jax.lax.ragged_dot(
                ((up + 1.0) * glu).astype(window.dtype), dw, gsz
            )
            return out + jnp.take(db, local_eid, axis=0)

    else:  # qwen / deepseek share the per-expert gate/up/down structure
        weight_leaves = (
            params[f"{prefix}.mlp.experts.gate_stacked"],
            params[f"{prefix}.mlp.experts.up_stacked"],
            params[f"{prefix}.mlp.experts.down_stacked"],
        )

        def expert_fn(window, gsz, leaves, local_eid):
            gw, uw, dw = leaves
            g_ = jax.lax.ragged_dot(window, gw, gsz)
            u_ = jax.lax.ragged_dot(window, uw, gsz)
            return jax.lax.ragged_dot(
                (act(g_) * u_).astype(window.dtype), dw, gsz
            )

    from jax.sharding import PartitionSpec as P

    def shard_fn(yv, valid, route_lv, weight_lv):
        x = yv.reshape(t, h)
        # routing is replicated work (tiny): identical on every shard, so
        # the sorted order below is globally agreed without communication;
        # padding tokens (valid == 0) join no group and consume no capacity
        top_w, top_i = route_fn(x, route_lv)
        order, token_of, flat_weight, group_sizes = _assignments_from(
            top_w, top_i, e, k, token_valid=valid
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
        local_eid = jnp.repeat(
            jnp.arange(e_local, dtype=jnp.int32), gsz,
            total_repeat_length=cap,
        )
        d_ = expert_fn(window, gsz, weight_lv, local_eid)
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
        in_specs=(
            P(), P(),
            tuple(P() for _ in route_leaves),
            tuple(P(ep_axis) for _ in weight_leaves),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )(y, valid, route_leaves, weight_leaves)
    if variant == "deepseek" and cfg.n_shared_experts:
        # always-on shared experts are replicated dense work outside the
        # expert-parallel region (HF DeepseekV3MoE.forward adds them last)
        out = out + _dense_mlp(
            params, cfg, f"{prefix}.mlp.shared_experts", y
        ).astype(out.dtype)
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
    position_ids: Optional[jnp.ndarray] = None,  # [B, S] or [3, B, S]
    inputs_embeds: Optional[jnp.ndarray] = None,  # [B, S, H]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Prefill forward → (aux concat [B, S, L*H], post-norm last hidden
    [B, S, H], moe_overflow int32 scalar).

    ``position_ids``: explicit positions — [3, B, S] enables the
    multimodal 3-axis rope on VL text towers (data/vlm.py computes vision
    spans); default is arange, which mrope degenerates to for pure text.
    ``inputs_embeds``: precomputed embeddings — the seam for multimodal
    captures where vision features are scattered into the text embeddings
    by an external vision tower.

    ``moe_overflow`` is structurally 0 except under ``moe_impl="ep"`` with a
    bounded ``moe_capacity_factor``, where it counts expert assignments NOT
    computed — it MUST be 0 for the capture to be exact (see
    ``_moe_mlp_ep``; EP requires ``moe_mesh`` +
    ``stack_moe_expert_params``-prepared params)."""
    cfg = config
    b, s = input_ids.shape
    capture_set = set(int(c) for c in capture_layers)

    if inputs_embeds is not None:
        x = inputs_embeds
    else:
        x = jnp.take(params["model.embed_tokens.weight"], input_ids, axis=0)
    if cfg.embed_scale:  # gemma3 scales by sqrt(hidden) in embedding dtype
        x = x * jnp.asarray(cfg.embed_scale, x.dtype)
    bias = make_causal_bias(attention_mask, b, s)
    sliding_bias = None
    if cfg.sliding_window and "sliding_attention" in cfg.layer_types:
        qi = jnp.arange(s)[:, None]
        ki = jnp.arange(s)[None, :]
        band = (qi - ki) < cfg.sliding_window
        sliding_bias = bias + jnp.where(band, 0.0, NEG_INF)[None, None]
    chunked_bias = None
    if (
        cfg.attention_chunk_size
        and "chunked_attention" in cfg.layer_types
        and s > cfg.attention_chunk_size
    ):
        # llama4 rope layers attend within position chunks (HF
        # create_chunked_causal_mask; chunk boundaries shift with LEFT
        # padding — capture inputs here are right-padded, offset 0)
        qi = jnp.arange(s)[:, None]
        ki = jnp.arange(s)[None, :]
        same = (qi // cfg.attention_chunk_size) == (
            ki // cfg.attention_chunk_size
        )
        chunked_bias = bias + jnp.where(same, 0.0, NEG_INF)[None, None]
    if position_ids is None:
        position_ids = jnp.broadcast_to(
            jnp.arange(s, dtype=jnp.int32)[None], (b, s)
        )
    if cfg.mrope_section and position_ids.ndim == 2:
        # text-only mrope degenerates to three identical position axes
        position_ids = jnp.broadcast_to(position_ids[None], (3, b, s))
    # rotary dim: MLA ropes only the shared qk_rope channels; glm/phi rope
    # a partial_rotary_factor fraction of the head dim
    if cfg.attn_variant == "mla":
        rot_dim = cfg.qk_rope_head_dim
    else:
        rot_dim = int(cfg.resolved_head_dim * cfg.partial_rotary_factor)
    rope_spec = RopeSpec.from_config(cfg)
    if rope_spec.head_dim != rot_dim:
        import dataclasses

        rope_spec = dataclasses.replace(rope_spec, head_dim=rot_dim)
    cos, sin = rope_cos_sin(rope_spec, position_ids, s, dtype=x.dtype)
    cos_local = sin_local = None
    if cfg.rope_local_base_freq and "sliding_attention" in cfg.layer_types:
        # gemma3: sliding layers use a separate local theta, default type
        local_spec = RopeSpec(
            head_dim=rot_dim, base=cfg.rope_local_base_freq,
            max_position_embeddings=cfg.max_position_embeddings,
        )
        cos_local, sin_local = rope_cos_sin(
            local_spec, position_ids, s, dtype=x.dtype
        )

    captured: Dict[int, jnp.ndarray] = {}
    if -1 in capture_set:  # embedding output, offset convention: id -1 → h[0]
        captured[-1] = x
    moe_overflow = jnp.zeros((), jnp.int32)

    for i in range(cfg.num_hidden_layers):
        prefix = f"model.layers.{i}"
        kind = cfg.layer_kind(i)
        sliding = kind == "sliding_attention"
        if sliding and sliding_bias is not None:
            bias_i = sliding_bias
        elif kind == "chunked_attention" and chunked_bias is not None:
            bias_i = chunked_bias
        else:
            bias_i = bias
        cos_i, sin_i = (
            (cos_local, sin_local)
            if (sliding and cos_local is not None)
            else (cos, sin)
        )

        if cfg.dual_sublayer:
            x = _longcat_layer(params, cfg, prefix, x, bias_i, cos_i, sin_i)
            if i in capture_set:
                captured[i] = x
            continue

        residual = x
        y = _norm(cfg, x, params[f"{prefix}.input_layernorm.weight"])
        if kind == "linear_attention":
            attn = _gdn_attention(params, cfg, prefix, y, attention_mask)
        elif cfg.attn_variant == "mla":
            attn = _mla_attention(params, cfg, prefix, y, bias_i, cos_i, sin_i)
        else:
            attn = _std_attention(
                params, cfg, prefix, y, bias_i, cos_i, sin_i, layer_idx=i
            )
        if cfg.sandwich_norms:  # gemma3 post-norms on the block OUTPUT
            attn = _norm(
                cfg, attn, params[f"{prefix}.post_attention_layernorm.weight"]
            )
            x = residual + attn
            residual = x
            y = _norm(
                cfg, x, params[f"{prefix}.pre_feedforward_layernorm.weight"]
            )
        else:
            x = residual + attn
            residual = x
            y = _norm(
                cfg, x, params[f"{prefix}.post_attention_layernorm.weight"]
            )

        if cfg.is_moe_layer(i):
            y_in = y
            if moe_impl == "ep":
                if cfg.moe_variant not in ("qwen", "deepseek", "gptoss"):
                    raise ValueError(
                        "moe_impl='ep' supports qwen/deepseek/gptoss MoE "
                        f"targets (got {cfg.moe_variant!r})"
                    )
                y, overflow = _moe_mlp_ep(
                    params, cfg, prefix, y, moe_mesh,
                    capacity_factor=moe_capacity_factor,
                    token_valid=attention_mask,
                )
                moe_overflow = moe_overflow + overflow
            elif cfg.moe_variant == "deepseek":
                y = _moe_deepseek(params, cfg, prefix, y)
            elif cfg.moe_variant == "gptoss":
                y = _moe_gptoss(params, cfg, prefix, y)
            elif cfg.moe_variant == "llama4":
                y = _moe_llama4(params, cfg, prefix, y)
            else:
                y = _moe_mlp(params, cfg, prefix, y, impl=moe_impl)
            if cfg.shared_expert_gated:
                # qwen3_next: sigmoid-gated always-on shared expert on the
                # MoE INPUT (HF Qwen3NextSparseMoeBlock.forward)
                shared = _dense_mlp(
                    params, cfg, f"{prefix}.mlp.shared_expert", y_in
                )
                gate = _linear(
                    params, f"{prefix}.mlp.shared_expert_gate", y_in
                )
                y = y + jax.nn.sigmoid(gate.astype(jnp.float32)).astype(
                    shared.dtype
                ) * shared
        else:
            # llama4 names the dense block feed_forward (Llama4TextMLP with
            # intermediate_size_mlp), everyone else mlp
            mlp_prefix = (
                f"{prefix}.feed_forward"
                if cfg.moe_variant == "llama4"
                else f"{prefix}.mlp"
            )
            y = _dense_mlp(params, cfg, mlp_prefix, y)
        if cfg.sandwich_norms:
            y = _norm(
                cfg, y, params[f"{prefix}.post_feedforward_layernorm.weight"]
            )
        x = residual + y

        if i in capture_set:
            captured[i] = x

    last_hidden = _norm(cfg, x, params["model.norm.weight"])
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
