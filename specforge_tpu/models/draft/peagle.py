"""P-EAGLE draft model — multi-layer parallel draft over EAGLE3 features.

First layer consumes the ``concat(embeds, hidden)`` 2*hidden input (separate
norms per half, EAGLE3-style); later layers are standard decoder layers. Unlike
EAGLE3 the embeddings are trainable and a learned ``mask_hidden`` vector stands
in for the target features at masked (depth>0) positions. Parity with
specforge/modeling/draft/peagle.py:97-322.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from specforge_tpu.models.draft.base import register_draft
from specforge_tpu.models.draft.llama_eagle3 import (
    ACT_FNS,
    Eagle3Config,
    Eagle3MLP,
    RMSNorm,
)
from specforge_tpu.ops.attention import NEG_INF
from specforge_tpu.ops.rope import RopeSpec, apply_rope, rope_cos_sin


@dataclass(frozen=True)
class PEagleConfig(Eagle3Config):
    norm_before_residual: bool = False


# sampled length at or above which the Pallas COD flash kernel beats the
# dense masked path (the dense path also stops fitting HBM around T~6k)
PEAGLE_PALLAS_MIN_T = 2048


def cod_capacities(
    seq_length: int,
    num_depths: int,
    down_sample_ratio: float,
    down_sample_ratio_min: float,
) -> Tuple[int, ...]:
    """Per-depth COD sample capacities (static given the sampler config).

    Depth 0 keeps every position; depth d keeps ``ceil(S * ratio^d)`` bounded
    below by ``ratio_min`` (reference peagle chain-of-draft sampling)."""
    caps = [seq_length]
    for d in range(1, num_depths):
        ratio = max(down_sample_ratio ** d, down_sample_ratio_min)
        caps.append(int(math.ceil(seq_length * ratio)))
    return tuple(caps)


class PEagleAttention(nn.Module):
    """Attention with arbitrary input width and an explicit [T, T] allow-mask.

    With ``cod_props`` (anchor/depth/anchor-doc/valid vectors) available, the
    Pallas COD flash kernel (ops/peagle_pallas.py) computes the same mask
    in-kernel — no [.., T, T] score/probability materialization."""

    config: PEagleConfig
    input_size: int
    dtype: Any = jnp.bfloat16
    # "auto" | "dense" | "pallas" | "pallas_interpret" (tests on CPU)
    attention_backend: str = "auto"

    def setup(self):
        cfg = self.config
        d = cfg.resolved_head_dim
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        # q/k/v merged into one matmul (MXU utilization — see
        # Eagle3Attention); the exporter splits it back to torch names
        self.qkv_proj = dense(
            (cfg.num_attention_heads + 2 * cfg.num_key_value_heads) * d,
            "qkv_proj",
        )
        self.o_proj = dense(cfg.hidden_size, "o_proj")

    def _resolve_backend(self, t, cod_props):
        if self.attention_backend != "auto":
            if (
                self.attention_backend in ("pallas", "pallas_interpret")
                and cod_props is None
            ):
                raise ValueError(
                    "pallas P-EAGLE attention requires cod_props"
                )
            return self.attention_backend
        if (
            cod_props is not None
            and t >= PEAGLE_PALLAS_MIN_T
            and jax.default_backend() == "tpu"
        ):
            return "pallas"
        return "dense"

    def __call__(self, x, allow_mask, cos, sin, cod_props=None):
        cfg = self.config
        b, t, _ = x.shape
        d = cfg.resolved_head_dim
        h, kvh = cfg.num_attention_heads, cfg.num_key_value_heads
        g = h // kvh
        qc, kc = h * d, kvh * d
        qkv = self.qkv_proj(x)
        q = qkv[..., :qc].reshape(b, t, h, d).transpose(0, 2, 1, 3)
        k = qkv[..., qc:qc + kc].reshape(b, t, kvh, d).transpose(0, 2, 1, 3)
        v = qkv[..., qc + kc:].reshape(b, t, kvh, d).transpose(0, 2, 1, 3)
        q, k = apply_rope(q, k, cos, sin)
        backend = self._resolve_backend(t, cod_props)
        if backend in ("pallas", "pallas_interpret"):
            from specforge_tpu.ops.peagle_pallas import cod_flash_attention

            out = cod_flash_attention(
                q, k, v, *cod_props,
                interpret=backend == "pallas_interpret",
                allow_mask=allow_mask,
            )
            return self.o_proj(out)
        qg = q.reshape(b, kvh, g, t, d)
        w = jnp.einsum(
            "bkgsd,bktd->bkgst", qg, k, preferred_element_type=jnp.float32
        ) / (d ** 0.5)
        w = jnp.where(allow_mask[:, None, None], w, NEG_INF)
        p = jax.nn.softmax(w, axis=-1).astype(x.dtype)
        out = jnp.einsum("bkgst,bktd->bkgsd", p, v)
        out = out.reshape(b, h, t, d).transpose(0, 2, 1, 3).reshape(b, t, h * d)
        return self.o_proj(out)


class PEagleFirstLayer(nn.Module):
    config: PEagleConfig
    dtype: Any = jnp.bfloat16
    attention_backend: str = "auto"

    def setup(self):
        cfg = self.config
        self.input_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                       name="input_layernorm")
        self.hidden_norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                   name="hidden_norm")
        self.self_attn = PEagleAttention(
            cfg, input_size=2 * cfg.hidden_size, dtype=self.dtype,
            attention_backend=self.attention_backend, name="self_attn",
        )
        self.post_attention_layernorm = RMSNorm(
            cfg.hidden_size, cfg.rms_norm_eps, name="post_attention_layernorm"
        )
        self.mlp = Eagle3MLP(cfg, dtype=self.dtype, name="mlp")

    def __call__(self, x2h, allow_mask, cos, sin, cod_props=None):
        mid = x2h.shape[-1] // 2
        embeds, hidden = x2h[..., :mid], x2h[..., mid:]
        residual = hidden
        embeds = self.input_layernorm(embeds)
        hidden = self.hidden_norm(hidden)
        if self.config.norm_before_residual:
            residual = hidden
        x = jnp.concatenate([embeds, hidden], axis=-1)
        x = self.self_attn(x, allow_mask, cos, sin, cod_props)
        hidden = residual + x
        residual = hidden
        hidden = self.post_attention_layernorm(hidden)
        hidden = self.mlp(hidden)
        return residual + hidden


class PEagleStandardLayer(nn.Module):
    config: PEagleConfig
    dtype: Any = jnp.bfloat16
    attention_backend: str = "auto"

    def setup(self):
        cfg = self.config
        self.input_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                       name="input_layernorm")
        self.self_attn = PEagleAttention(
            cfg, input_size=cfg.hidden_size, dtype=self.dtype,
            attention_backend=self.attention_backend, name="self_attn"
        )
        self.post_attention_layernorm = RMSNorm(
            cfg.hidden_size, cfg.rms_norm_eps, name="post_attention_layernorm"
        )
        self.mlp = Eagle3MLP(cfg, dtype=self.dtype, name="mlp")

    def __call__(self, x, allow_mask, cos, sin, cod_props=None):
        residual = x
        x = self.input_layernorm(x)
        x = self.self_attn(x, allow_mask, cos, sin, cod_props)
        x = residual + x
        residual = x
        x = self.post_attention_layernorm(x)
        x = self.mlp(x)
        return residual + x


@register_draft
class PEagleDraftModel(nn.Module):
    """Multi-layer parallel draft; trains its own embeddings + mask_hidden."""

    config: PEagleConfig
    dtype: Any = jnp.bfloat16
    attention_backend: str = "auto"

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
            param_dtype=jnp.float32, name="embed_tokens",
        )
        fc_in = cfg.resolved_target_hidden_size * 3
        self.fc = nn.Dense(
            cfg.hidden_size, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="fc",
        )
        self.mask_hidden = self.param(
            "mask_hidden", nn.initializers.normal(1.0), (1, 1, fc_in),
            jnp.float32,
        )
        layers = [PEagleFirstLayer(
            cfg, dtype=self.dtype, attention_backend=self.attention_backend,
            name="layers_0",
        )]
        for i in range(1, cfg.num_hidden_layers):
            layers.append(
                PEagleStandardLayer(
                    cfg, dtype=self.dtype,
                    attention_backend=self.attention_backend,
                    name=f"layers_{i}",
                )
            )
        self.layers = layers
        self.norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, name="norm")
        self.lm_head = nn.Dense(
            cfg.draft_vocab_size, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="lm_head",
        )
        self.rope_spec = RopeSpec.from_config(cfg)
        self.t2d = self.variable(
            "buffers", "t2d", lambda: jnp.ones((cfg.vocab_size,), jnp.bool_)
        )
        self.d2t = self.variable(
            "buffers", "d2t",
            lambda: jnp.zeros((cfg.draft_vocab_size,), jnp.int32),
        )

    def get_vocab_maps(self):
        return self.t2d.value, self.d2t.value

    def get_mask_hidden(self):
        return self.mask_hidden

    def embed_input_ids(self, input_ids):
        # gather fp32 rows FIRST, cast after: nn.Embed's dtype promotion
        # casts the whole [V, H] table to bf16 before the take (~600 MB
        # write per step at 152k vocab ≈ 5.6 ms on v5e) to produce a few
        # thousand rows
        table = self.embed_tokens.embedding
        return jnp.take(table, input_ids, axis=0).astype(self.dtype)

    def project_hidden_states(self, hidden_3h):
        return self.fc(hidden_3h)

    def compute_logits(self, hidden):
        return self.lm_head(self.norm(hidden))

    def backbone(self, input_embeds, hidden_states, allow_mask, position_ids,
                 cod_props=None):
        """input_embeds/hidden_states: [B, T, h]; allow_mask [B, T, T];
        cod_props: optional (anchor, depth, anchor_doc, valid) [B, T] vectors
        enabling the Pallas in-kernel-mask backend."""
        x = jnp.concatenate(
            [input_embeds.astype(self.dtype), hidden_states.astype(self.dtype)],
            axis=-1,
        )
        seq_hint = int(self.config.max_position_embeddings)
        cos, sin = rope_cos_sin(
            self.rope_spec, position_ids, seq_hint, dtype=x.dtype
        )
        h = x
        for layer in self.layers:
            h = layer(h, allow_mask, cos, sin, cod_props)
        return h
