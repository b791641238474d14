"""DFlash draft model — N-layer Qwen3-style block-diffusion decoder.

Per layer, draft (mask-token) queries cross-attend to a shared projected
target-hidden context (as a KV prefix) plus their own block's draft keys; the
context stream is never updated. Parity with
specforge/modeling/draft/dflash.py:97-460 (Qwen3DFlashAttention with per-head
q/k RMS norms, layer_types full/sliding, evenly-spaced capture layers via
``build_target_layer_ids``).

TPU shape contract: attention runs through the chunked anchor-block kernel
(:func:`specforge_tpu.ops.attention.dflash_attention`) — no dense [Q, S+Q]
mask tensor, no flex-attention block mask.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from specforge_tpu.models.draft.base import DraftModelConfig, register_draft
from specforge_tpu.models.draft.llama_eagle3 import ACT_FNS, RMSNorm
from specforge_tpu.ops.attention import dflash_attention
from specforge_tpu.ops.rope import RopeSpec, apply_rope, rope_cos_sin

FULL_ATTENTION = "full_attention"
SLIDING_ATTENTION = "sliding_attention"


class KernelParam(nn.Module):
    """Bias-free linear kernel exposed as a raw array (same param path and
    init as ``nn.Dense(use_bias=False)``: ``<name>/kernel`` of shape
    ``(in_features, out_features)``) so fused objectives
    (ops/fused_objective.py) can consume the weight directly instead of
    calling the layer."""

    shape: tuple

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


class MergedProj(nn.Module):
    """Column-merged linear params (``<name>/kernel`` [+ ``/bias``]) exposed
    raw so callers can matmul column slices (e.g. the context stream uses
    only the k/v columns of the merged qkv kernel). ``lecun_normal`` variance
    depends only on fan-in, so the merged init distribution equals the
    separate per-projection inits."""

    shape: tuple  # (in_features, out_features)
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.shape[1],),
                       jnp.float32)
            if self.use_bias else None
        )
        return kernel, bias


def build_target_layer_ids(num_target_layers: int, num_draft_layers: int):
    """Evenly spaced capture layers (reference dflash.py:271-281)."""
    if num_draft_layers == 1:
        return [num_target_layers // 2]
    start, end = 1, num_target_layers - 3
    span = end - start
    return [
        int(round(start + (i * span) / (num_draft_layers - 1)))
        for i in range(num_draft_layers)
    ]


@dataclass(frozen=True)
class DFlashConfig(DraftModelConfig):
    block_size: int = 16
    num_target_layers: int = 36
    layer_types: Tuple[str, ...] = ()
    sliding_window: Optional[int] = None
    use_sliding_window: bool = False
    attention_bias: bool = False
    # dflash_config sub-dict of the reference configs
    mask_token_id: Optional[int] = None
    target_layer_ids: Optional[Tuple[int, ...]] = None
    projector_type: Optional[str] = None
    pure_draft_prefix_len: int = 0
    shift_label: bool = False
    # domino head
    emb_dim: int = 0
    gru_hidden_dim: int = 0
    # dspark heads
    markov_rank: int = 0
    markov_head_type: str = "vanilla"
    enable_confidence_head: bool = False
    confidence_head_with_markov: bool = False

    @classmethod
    def from_dict(cls, obj: Dict[str, Any]) -> "DFlashConfig":
        obj = dict(obj)
        dflash_cfg = obj.pop("dflash_config", {}) or {}
        merged = {**obj, **dflash_cfg}
        known = cls.field_names()
        kwargs = {k: v for k, v in merged.items() if k in known}
        for key in ("architectures", "layer_types", "target_layer_ids"):
            if kwargs.get(key) is not None:
                kwargs[key] = tuple(kwargs[key])
        cfg = cls(**kwargs)
        cfg.validate_layout()
        return cfg

    def validate_layout(self) -> None:
        if self.layer_types:
            if len(self.layer_types) != self.num_hidden_layers:
                raise ValueError(
                    "layer_types must have num_hidden_layers="
                    f"{self.num_hidden_layers} entries, got "
                    f"{len(self.layer_types)}"
                )
            invalid = set(self.layer_types) - {FULL_ATTENTION, SLIDING_ATTENTION}
            if invalid:
                raise ValueError(
                    f"unsupported layer_types {sorted(invalid)}"
                )
            if SLIDING_ATTENTION in self.layer_types and not (
                self.sliding_window and self.sliding_window > 0
            ):
                raise ValueError(
                    "sliding_attention layers require a positive sliding_window"
                )

    @property
    def resolved_layer_types(self) -> Tuple[str, ...]:
        return self.layer_types or (FULL_ATTENTION,) * self.num_hidden_layers

    @property
    def resolved_target_layer_ids(self) -> Tuple[int, ...]:
        if self.target_layer_ids is not None:
            return tuple(self.target_layer_ids)
        return tuple(
            build_target_layer_ids(self.num_target_layers, self.num_hidden_layers)
        )


# context length at or above which the Pallas in-kernel-mask backend beats
# the chunked XLA path (v5e, N=512 anchors: 0.86x at 2k, 2.0x at 4k, 2.9x at
# 8k fwd+bwd — grid-step overhead dominates below, tile-skipping wins above)
DFLASH_PALLAS_MIN_CTX = 4096


class DFlashAttention(nn.Module):
    config: DFlashConfig
    layer_idx: int
    dtype: Any = jnp.bfloat16
    attention_backend: str = "auto"

    def _resolve_backend(self, seq_len: int) -> str:
        if self.attention_backend != "auto":
            return self.attention_backend
        if (
            seq_len >= DFLASH_PALLAS_MIN_CTX
            and jax.default_backend() == "tpu"
        ):
            return "pallas"
        return "chunked"

    def setup(self):
        cfg = self.config
        d = cfg.resolved_head_dim
        h, kvh = cfg.num_attention_heads, cfg.num_key_value_heads
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=cfg.attention_bias, dtype=self.dtype,
            param_dtype=jnp.float32, name=name,
        )
        # q/k/v merged into ONE [H, (h+2*kvh)*d] projection: on v5e a bare
        # [8192,4096]x[4096,4096] matmul reaches only ~54% of peak and
        # [.,12288] ~76%, while the same FLOPs in one wider matmul reach
        # 84-89% (MXU ramp/weight-streaming amortization) — merging the
        # draft-stream projections is worth several ms/step at the bench
        # shape. The context stream multiplies only the k/v column slice of
        # the same kernel (no wasted q FLOPs). The reference keeps separate
        # q_proj/k_proj/v_proj (dflash.py:97-460); the exporter splits the
        # merged kernel back to torch names (export/exporter.py) and warm
        # start folds them (training/model_loading.py).
        self.qkv_proj = MergedProj(
            (cfg.hidden_size, (h + 2 * kvh) * d),
            use_bias=cfg.attention_bias, name="qkv_proj",
        )
        self.o_proj = dense(cfg.hidden_size, "o_proj")
        self.q_norm = RMSNorm(d, cfg.rms_norm_eps, name="q_norm")
        self.k_norm = RMSNorm(d, cfg.rms_norm_eps, name="k_norm")
        self.rope_spec = RopeSpec.from_config(cfg)
        self.sliding_window = (
            cfg.sliding_window
            if cfg.resolved_layer_types[self.layer_idx] == SLIDING_ATTENTION
            else None
        )

    def __call__(
        self,
        draft_hidden: jnp.ndarray,       # [B, Q, h]
        context_hidden: jnp.ndarray,     # [B, S, h]
        ctx_position_ids: jnp.ndarray,   # [B, S]
        draft_position_ids: jnp.ndarray, # [B, Q]
        anchor_positions: jnp.ndarray,
        block_keep_mask: jnp.ndarray,
        chunk_blocks: int,
    ) -> jnp.ndarray:
        cfg = self.config
        b, q_len, _ = draft_hidden.shape
        s = context_hidden.shape[1]
        d = cfg.resolved_head_dim
        h, kvh = cfg.num_attention_heads, cfg.num_key_value_heads

        qc, kc = h * d, kvh * d
        kernel, bias = self.qkv_proj()
        kernel = kernel.astype(self.dtype)
        qkv = draft_hidden @ kernel
        kv_ctx = context_hidden @ kernel[:, qc:]
        if bias is not None:
            qkv = qkv + bias.astype(self.dtype)
            kv_ctx = kv_ctx + bias[qc:].astype(self.dtype)
        # per-head norms apply over the last dim; operate in [B, T, nh, d]
        q = qkv[..., :qc].reshape(b, q_len, h, d)
        q = self.q_norm(q).transpose(0, 2, 1, 3)
        k_ctx = kv_ctx[..., :kc].reshape(b, s, kvh, d)
        k_drf = qkv[..., qc:qc + kc].reshape(b, q_len, kvh, d)
        k_ctx = self.k_norm(k_ctx).transpose(0, 2, 1, 3)
        k_drf = self.k_norm(k_drf).transpose(0, 2, 1, 3)
        v_ctx = kv_ctx[..., kc:].reshape(b, s, kvh, d).transpose(0, 2, 1, 3)
        v_drf = qkv[..., qc + kc:].reshape(b, q_len, kvh, d).transpose(0, 2, 1, 3)

        cos_c, sin_c = rope_cos_sin(self.rope_spec, ctx_position_ids, s,
                                    dtype=q.dtype)
        cos_d, sin_d = rope_cos_sin(self.rope_spec, draft_position_ids, q_len,
                                    dtype=q.dtype)
        q, k_drf = apply_rope(q, k_drf, cos_d, sin_d)
        # context keys rotate by their own positions (q unused)
        _, k_ctx = apply_rope(k_ctx, k_ctx, cos_c, sin_c)

        attn = None
        backend = self._resolve_backend(s)
        if backend in ("pallas", "pallas_interpret"):
            from specforge_tpu.ops.dflash_pallas import dflash_flash_attention

            attn = dflash_flash_attention(
                q, k_ctx, v_ctx, k_drf, v_drf,
                anchor_positions, block_keep_mask, cfg.block_size,
                sliding_window=self.sliding_window,
                interpret=backend == "pallas_interpret",
            )  # None when the shape doesn't tile
        if attn is None:
            attn = dflash_attention(
                q, k_ctx, v_ctx, k_drf, v_drf,
                anchor_positions, block_keep_mask,
                cfg.block_size, chunk_blocks=chunk_blocks,
                sliding_window=self.sliding_window,
            )
        return self.o_proj(attn)


class DFlashMLP(nn.Module):
    config: DFlashConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        act = ACT_FNS[cfg.hidden_act]
        # gate+up merged into one [H, 2F] matmul (same MXU-utilization
        # argument as the merged qkv projection; exporter splits it back)
        f = cfg.intermediate_size
        gate_up = dense(2 * f, "gate_up_proj")(x)
        return dense(cfg.hidden_size, "down_proj")(
            act(gate_up[..., :f]) * gate_up[..., f:]
        )


class DFlashDecoderLayer(nn.Module):
    config: DFlashConfig
    layer_idx: int
    dtype: Any = jnp.bfloat16
    attention_backend: str = "chunked"

    def setup(self):
        cfg = self.config
        self.self_attn = DFlashAttention(cfg, self.layer_idx, dtype=self.dtype,
                                         attention_backend=self.attention_backend,
                                         name="self_attn")
        self.mlp = DFlashMLP(cfg, dtype=self.dtype, name="mlp")
        self.input_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                       name="input_layernorm")
        self.post_attention_layernorm = RMSNorm(
            cfg.hidden_size, cfg.rms_norm_eps, name="post_attention_layernorm"
        )

    def __call__(self, draft_hidden, context_hidden, ctx_position_ids,
                 draft_position_ids, anchor_positions, block_keep_mask,
                 chunk_blocks):
        residual = draft_hidden
        x = self.input_layernorm(draft_hidden)
        x = self.self_attn(
            x, context_hidden, ctx_position_ids, draft_position_ids,
            anchor_positions, block_keep_mask, chunk_blocks,
        )
        draft_hidden = residual + x
        residual = draft_hidden
        x = self.post_attention_layernorm(draft_hidden)
        x = self.mlp(x)
        return residual + x


@register_draft
class DFlashDraftModel(nn.Module):
    config: DFlashConfig
    dtype: Any = jnp.bfloat16
    attn_chunk_blocks: int = 8
    # "auto" (pallas on TPU at ctx >= DFLASH_PALLAS_MIN_CTX, else chunked) |
    # "chunked" (XLA, mask per anchor chunk) | "pallas" (in-kernel mask,
    # ops/dflash_pallas.py) | "pallas_interpret" (tests on CPU)
    attention_backend: str = "auto"

    def setup(self):
        cfg = self.config
        self.layers = [
            DFlashDecoderLayer(
                cfg, i, dtype=self.dtype, name=f"layers_{i}",
                attention_backend=self.attention_backend,
            )
            for i in range(cfg.num_hidden_layers)
        ]
        self.fc = nn.Dense(
            cfg.hidden_size, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="fc",
        )
        self.hidden_norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                   name="hidden_norm")
        self.norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, name="norm")
        self._init_draft_head()

    def _init_draft_head(self) -> None:
        """Override point for Domino / DSpark auxiliary heads."""

    def project_context(self, target_hidden: jnp.ndarray) -> jnp.ndarray:
        """[B, S, L*hidden] capture concat → normed [B, S, hidden] context."""
        return self.hidden_norm(self.fc(target_hidden))

    def __call__(
        self,
        noise_embedding: jnp.ndarray,     # [B, N*block, h] mask-token embeds
        target_hidden: jnp.ndarray,       # [B, S, L*h] capture concat
        ctx_position_ids: jnp.ndarray,
        draft_position_ids: jnp.ndarray,
        anchor_positions: jnp.ndarray,
        block_keep_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        hidden = noise_embedding.astype(self.dtype)
        context = self.project_context(target_hidden.astype(self.dtype))
        for layer in self.layers:
            hidden = layer(
                hidden, context, ctx_position_ids, draft_position_ids,
                anchor_positions, block_keep_mask, self.attn_chunk_blocks,
            )
        return self.norm(hidden)

    # --- auxiliary-head seams (overridden by Domino / DSpark) -------------
    def apply_logits_head(
        self,
        base_logits: jnp.ndarray,
        *,
        prev_token_ids: Optional[jnp.ndarray] = None,
        prev_token_embeddings: Optional[jnp.ndarray] = None,
        hidden_states: jnp.ndarray,
    ) -> jnp.ndarray:
        return base_logits

    def predict_confidence(
        self,
        hidden_states: jnp.ndarray,
        *,
        prev_token_ids: Optional[jnp.ndarray] = None,
    ) -> Optional[jnp.ndarray]:
        return None
