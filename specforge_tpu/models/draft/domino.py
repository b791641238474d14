"""Domino draft model: DFlash backbone + GRU logits-correction head.

The base draft logits come from the frozen target ``lm_head``; Domino adds a
corrective term computed by a single-layer (bias-free) GRU over previous-token
embeddings concatenated with the draft hidden state, projected through a
2-layer SiLU MLP to the vocabulary. Parity with
specforge/modeling/draft/domino.py:19-141 (including ``shift_label`` /
``pure_draft_prefix_len`` suffix gating).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from specforge_tpu.models.draft.base import register_draft
from specforge_tpu.models.draft.dflash import (
    DFlashConfig,
    DFlashDraftModel,
    KernelParam,
)


class GRU(nn.Module):
    """Bias-free single-layer GRU matching torch.nn.GRU(bias=False) equations:

        r = σ(W_ir x + W_hr h);  z = σ(W_iz x + W_hz h)
        n = tanh(W_in x + r ⊙ (W_hn h));  h' = (1 - z) ⊙ n + z ⊙ h
    """

    hidden_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xs: jnp.ndarray) -> jnp.ndarray:
        """xs: [batch, time, input] → outputs [batch, time, hidden]."""
        input_dim = xs.shape[-1]
        w_ih = self.param(
            "weight_ih", nn.initializers.lecun_normal(),
            (3 * self.hidden_dim, input_dim), jnp.float32,
        )
        w_hh = self.param(
            "weight_hh", nn.initializers.orthogonal(),
            (3 * self.hidden_dim, self.hidden_dim), jnp.float32,
        )
        w_ih_t = w_ih.astype(self.dtype).T
        w_hh_t = w_hh.astype(self.dtype).T
        hd = self.hidden_dim

        def step(h, gi):
            gh = h @ w_hh_t
            i_r, i_z, i_n = gi[..., :hd], gi[..., hd:2 * hd], gi[..., 2 * hd:]
            h_r, h_z, h_n = gh[..., :hd], gh[..., hd:2 * hd], gh[..., 2 * hd:]
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        h0 = jnp.zeros((xs.shape[0], hd), self.dtype)
        xs_t = jnp.moveaxis(xs.astype(self.dtype), 1, 0)
        # the input projection carries the GRU's FLOPs (input_dim >> hd):
        # hoist it out of the recurrence as ONE [time*batch, input] MXU
        # matmul; only the hd x 3hd recurrent matmul stays sequential
        gi_all = xs_t @ w_ih_t  # [time, batch, 3*hd]
        _, outs = jax.lax.scan(step, h0, gi_all)
        return jnp.moveaxis(outs, 0, 1)


@register_draft
class DominoDraftModel(DFlashDraftModel):
    """DFlash backbone with Domino's GRU logits correction."""

    def _init_draft_head(self) -> None:
        cfg = self.config
        if cfg.projector_type not in (None, "domino"):
            raise ValueError(
                "DominoDraftModel requires projector_type='domino', got "
                f"{cfg.projector_type!r}"
            )
        self.prefix_gru = GRU(cfg.gru_hidden_dim, dtype=self.dtype,
                              name="prefix_gru")
        self.embed_proj_0 = nn.Dense(
            cfg.emb_dim, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="embed_proj_0",
        )
        self.embed_proj_1 = KernelParam(
            (cfg.emb_dim, cfg.vocab_size), name="embed_proj_1"
        )

    @property
    def suffix_start(self) -> int:
        cfg = self.config
        return (
            cfg.pure_draft_prefix_len
            if cfg.shift_label
            else 1 + cfg.pure_draft_prefix_len
        )

    def correction_activation(
        self,
        prev_token_embeddings: jnp.ndarray,  # [B, N, block, emb_hidden]
        hidden_states: jnp.ndarray,          # [B, N, block, h]
    ) -> jnp.ndarray:
        """Pre-``embed_proj_1`` activation [B, N, block, emb_dim], zeroed
        before ``suffix_start`` (prefix block positions get no correction)."""
        cfg = self.config
        b, n, bs = hidden_states.shape[:3]
        start = self.suffix_start

        if cfg.shift_label:
            gru_in = prev_token_embeddings.reshape(b * n, bs, -1)
            gru_out = self.prefix_gru(gru_in).reshape(b, n, bs, -1)
            prefix_states = gru_out[:, :, start:, :]
        else:
            gru_in = prev_token_embeddings[:, :, : bs - 1, :].reshape(
                b * n, bs - 1, -1
            )
            gru_out = self.prefix_gru(gru_in).reshape(b, n, bs - 1, -1)
            prefix_states = gru_out[:, :, start - 1:, :]

        z_n = hidden_states[:, :, start:, :]
        concat = jnp.concatenate(
            [z_n, prefix_states.astype(z_n.dtype)], axis=-1
        )
        act = jax.nn.silu(self.embed_proj_0(concat))
        pad = jnp.zeros((b, n, start, act.shape[-1]), act.dtype)
        return jnp.concatenate([pad, act], axis=2)

    def logits_head_kernel(self) -> jnp.ndarray:
        """Trainable ``embed_proj_1`` kernel [emb_dim, vocab]."""
        return self.embed_proj_1()

    def apply_logits_head(
        self,
        base_logits: jnp.ndarray,   # [B, N, block, V]
        *,
        prev_token_ids: Optional[jnp.ndarray] = None,
        prev_token_embeddings: Optional[jnp.ndarray] = None,
        hidden_states: jnp.ndarray,  # [B, N, block, h]
    ) -> jnp.ndarray:
        if prev_token_embeddings is None:
            raise ValueError("DominoDraftModel requires prev_token_embeddings")
        act = self.correction_activation(prev_token_embeddings, hidden_states)
        kernel = self.embed_proj_1().astype(act.dtype)
        logits_e = act @ kernel
        # prefix rows of ``act`` are exact zeros, so adding everywhere equals
        # the reference's prefix/suffix concatenate
        return base_logits + logits_e.astype(base_logits.dtype)
