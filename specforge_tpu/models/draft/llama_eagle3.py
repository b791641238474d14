"""EAGLE3 draft model — a 1-layer Llama-style decoder over concat(embed, hidden).

Structure (parity with specforge/modeling/draft/llama3_eagle.py:1654-1798):

- ``embed_tokens``       — target-copied embedding (frozen by default).
- ``fc``                 — [3*target_hidden → hidden] aux-layer projection,
                           optionally preceded by per-chunk RMSNorms
                           (``fc_norm`` flag = the EAGLE3.1 variant).
- ``midlayer``           — one decoder layer whose q/k/v projections read the
                           2*hidden concat of normed input-embedding and normed
                           (projected) hidden state.
- ``norm`` + ``lm_head`` — draft-vocab head (``norm_output`` gates the norm).
- ``t2d``/``d2t``        — vocab-mapping buffers (collection ``buffers``).

All matmuls run in ``dtype`` (bf16 by default) with fp32 parameters; RMSNorm
computes in fp32. The TTT step is exposed as the functional ``ttt_step`` method
with an explicit branch-cache argument — the Python-unrolled TTT loop in
``specforge_tpu.algorithms.eagle3`` passes a growing tuple of per-branch K/V
(static length under jit).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from specforge_tpu.models.draft.base import DraftModelConfig, register_draft
from specforge_tpu.ops.attention import ttt_branch_attention
from specforge_tpu.ops.rope import RopeSpec, apply_multimodal_rope, apply_rope, rope_cos_sin

ACT_FNS = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "relu": jax.nn.relu,
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
}


@dataclass(frozen=True)
class Eagle3Config(DraftModelConfig):
    draft_vocab_size: int = 32000
    target_hidden_size: Optional[int] = None
    fc_norm: bool = False          # EAGLE3.1: per-chunk RMSNorm before fc
    norm_output: bool = True       # apply final norm before lm_head

    @property
    def resolved_target_hidden_size(self) -> int:
        return self.target_hidden_size or self.hidden_size


class RMSNorm(nn.Module):
    """RMSNorm with fp32 statistics, output in the input dtype."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        x32 = x32 * jax.lax.rsqrt(var + self.eps)
        return weight.astype(dtype) * x32.astype(dtype)


class Eagle3Attention(nn.Module):
    config: Eagle3Config
    dtype: Any = jnp.bfloat16
    #: "dense" (single/fsdp) or "usp" (sequence-parallel ulysses×ring over the
    #: sp mesh axes; batch-size-1 long-context training)
    attention_backend: str = "dense"
    mesh: Any = None

    def setup(self):
        cfg = self.config
        d = cfg.resolved_head_dim
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        # q/k/v merged into one [2H, (h+2*kvh)*d] matmul: several separate
        # sub-TFLOP matmuls run at 54-76% of v5e peak while the same FLOPs
        # merged reach 84-89% (MXU ramp/weight-streaming amortization). The
        # reference keeps separate projections (llama3_eagle.py); the
        # exporter splits the merged kernel back to torch q/k/v names and
        # warm start folds published EAGLE3 heads into it
        # (export/exporter.py, training/model_loading.py).
        self.qkv_proj = dense(
            (cfg.num_attention_heads + 2 * cfg.num_key_value_heads) * d,
            "qkv_proj",
        )
        self.o_proj = dense(cfg.hidden_size, "o_proj")
        self.rope_spec = RopeSpec.from_config(cfg)

    def __call__(
        self,
        hidden_2h: jnp.ndarray,
        cache: Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]],
        bias: Optional[jnp.ndarray],
        position_ids: jnp.ndarray,
        key_valid: Optional[jnp.ndarray] = None,
    ):
        """One TTT attention step.

        Args:
            hidden_2h: [B, S, 2*hidden] concat of normed embed and hidden.
            cache: (keys, values) tuples of earlier-branch [B, KVH, S, D];
                empty tuples on the first step.
            bias: [B, 1, S, S] additive causal bias (dense backend; None for
                usp, which never materializes the S×S mask).
            position_ids: [B, S] (already offset by the branch index).
            key_valid: [B, S] real-token mask (usp backend padding).

        Returns:
            (attn_out [B, S, hidden], new_cache).
        """
        cfg = self.config
        b, s, _ = hidden_2h.shape
        d = cfg.resolved_head_dim
        h, kvh = cfg.num_attention_heads, cfg.num_key_value_heads

        qc, kc = h * d, kvh * d
        qkv = self.qkv_proj(hidden_2h)
        q = qkv[..., :qc].reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = qkv[..., qc:qc + kc].reshape(b, s, kvh, d).transpose(0, 2, 1, 3)
        v = qkv[..., qc + kc:].reshape(b, s, kvh, d).transpose(0, 2, 1, 3)

        lck = len(cache[0])
        if self.rope_spec.scaling_type == "mrope":
            if position_ids.ndim == 2:
                # text-only sample: all three mrope axes share the positions
                position_ids = jnp.broadcast_to(
                    position_ids[None], (3,) + position_ids.shape
                )
            cos, sin = rope_cos_sin(
                self.rope_spec, position_ids + lck, s + lck, dtype=q.dtype
            )
            q, k = apply_multimodal_rope(
                q, k, cos, sin, self.rope_spec.mrope_section
            )
        else:
            cos, sin = rope_cos_sin(
                self.rope_spec, position_ids + lck, s + lck, dtype=q.dtype
            )
            q, k = apply_rope(q, k, cos, sin)

        keys = tuple(cache[0]) + (k,)
        values = tuple(cache[1]) + (v,)
        if self.attention_backend == "pallas":
            from specforge_tpu.ops.attention_pallas import ttt_flash_attention

            attn_out = ttt_flash_attention(
                q, list(keys), list(values), key_valid=key_valid
            )
        elif self.attention_backend == "usp":
            from specforge_tpu.parallel.usp import usp_ttt_attention

            # the Ulysses head exchange divides heads across devices, so KV
            # heads expand to the full head count first (reference repeat_kv
            # before SeqAllToAll4D)
            g = h // kvh
            expand = lambda x: jnp.repeat(x, g, axis=1)
            attn_out = usp_ttt_attention(
                self.mesh, q,
                [expand(kk) for kk in keys],
                [expand(vv) for vv in values],
                key_valid=key_valid,
            )
        else:
            attn_out = ttt_branch_attention(q, list(keys), list(values), bias)
        return self.o_proj(attn_out), (keys, values)


class Eagle3MLP(nn.Module):
    config: Eagle3Config
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )
        act = ACT_FNS[cfg.hidden_act]
        # gate+up merged into one [H, 2F] matmul (MXU utilization; the
        # exporter splits it back to gate_proj/up_proj)
        f = cfg.intermediate_size
        gate_up = dense(2 * f, "gate_up_proj")(x)
        return dense(cfg.hidden_size, "down_proj")(
            act(gate_up[..., :f]) * gate_up[..., f:]
        )


class Eagle3DecoderLayer(nn.Module):
    config: Eagle3Config
    dtype: Any = jnp.bfloat16
    attention_backend: str = "dense"
    mesh: Any = None

    def setup(self):
        cfg = self.config
        self.self_attn = Eagle3Attention(
            cfg, dtype=self.dtype, attention_backend=self.attention_backend,
            mesh=self.mesh, name="self_attn",
        )
        self.mlp = Eagle3MLP(cfg, dtype=self.dtype, name="mlp")
        self.hidden_norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                   name="hidden_norm")
        self.input_layernorm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps,
                                       name="input_layernorm")
        self.post_attention_layernorm = RMSNorm(
            cfg.hidden_size, cfg.rms_norm_eps, name="post_attention_layernorm"
        )

    def __call__(self, input_emb, hidden_states, cache, bias, position_ids,
                 key_valid=None):
        residual = hidden_states
        normed_hidden = self.hidden_norm(hidden_states)
        normed_emb = self.input_layernorm(input_emb)
        hidden_2h = jnp.concatenate([normed_emb, normed_hidden], axis=-1)
        attn_out, cache = self.self_attn(
            hidden_2h, cache, bias, position_ids, key_valid
        )
        hidden_states = residual + attn_out

        residual = hidden_states
        hidden_states = self.post_attention_layernorm(hidden_states)
        hidden_states = self.mlp(hidden_states)
        hidden_states = residual + hidden_states
        return hidden_states, cache


@register_draft
class LlamaEagle3Draft(nn.Module):
    """EAGLE3 draft model (architecture name kept for config interop)."""

    config: Eagle3Config
    dtype: Any = jnp.bfloat16
    attention_backend: str = "dense"
    mesh: Any = None

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
            param_dtype=jnp.float32, name="embed_tokens",
        )
        self.midlayer = Eagle3DecoderLayer(
            cfg, dtype=self.dtype, attention_backend=self.attention_backend,
            mesh=self.mesh, name="midlayer",
        )
        self.fc = nn.Dense(
            cfg.hidden_size, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="fc",
        )
        if cfg.fc_norm:
            self.fc_norms = [
                RMSNorm(cfg.resolved_target_hidden_size, cfg.rms_norm_eps,
                        name=f"fc_norm_{i}")
                for i in range(3)
            ]
        else:
            self.fc_norms = None
        self.norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, name="norm")
        self.lm_head = nn.Dense(
            cfg.draft_vocab_size, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="lm_head",
        )
        # Vocab-map buffers: identity defaults (t2d all-true only makes sense
        # when draft_vocab == vocab; real maps are loaded from the vocab
        # mapping file and overwrite these).
        self.t2d = self.variable(
            "buffers", "t2d",
            lambda: jnp.ones((cfg.vocab_size,), jnp.bool_),
        )
        self.d2t = self.variable(
            "buffers", "d2t",
            lambda: jnp.zeros((cfg.draft_vocab_size,), jnp.int32),
        )

    # --- functional pieces used by the TTT training loop -------------------

    def get_vocab_maps(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(t2d bool [V], d2t int32 [V_draft]) buffers."""
        return self.t2d.value, self.d2t.value

    def embed_input_ids(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed_tokens(input_ids)

    def project_hidden_states(self, hidden_3h: jnp.ndarray) -> jnp.ndarray:
        """[B, S, 3*target_hidden] aux concat → [B, S, hidden]."""
        th = self.config.resolved_target_hidden_size
        assert hidden_3h.shape[-1] == 3 * th, (
            f"expected aux concat of 3*{th}, got {hidden_3h.shape[-1]}"
        )
        if self.fc_norms is not None:
            chunks = jnp.split(hidden_3h, 3, axis=-1)
            hidden_3h = jnp.concatenate(
                [norm(c) for norm, c in zip(self.fc_norms, chunks)], axis=-1
            )
        return self.fc(hidden_3h)

    def ttt_step(self, input_embeds, hidden_states, cache, bias, position_ids,
                 key_valid=None):
        """One decoder-layer step of the TTT unroll → (hidden_out, new_cache)."""
        return self.midlayer(input_embeds, hidden_states, cache, bias,
                             position_ids, key_valid)

    def compute_logits(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        h = self.norm(hidden_states) if self.config.norm_output else hidden_states
        return self.lm_head(h)

    def __call__(self, input_ids, hidden_3h, bias=None, position_ids=None):
        """Single forward (inference-shape): embed + project + 1 step + logits."""
        b, s = input_ids.shape
        embeds = self.embed_input_ids(input_ids)
        hidden = self.project_hidden_states(hidden_3h)
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32)[None], (b, s)
            )
        if bias is None:
            from specforge_tpu.ops.attention import make_causal_bias

            bias = make_causal_bias(None, b, s)
        hidden, _ = self.ttt_step(embeds, hidden, ((), ()), bias, position_ids)
        return self.compute_logits(hidden)
