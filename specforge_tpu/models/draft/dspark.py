"""DSpark draft model: DFlash backbone + Markov logit bias + confidence head.

Markov heads add a low-rank previous-token bias to the base (frozen-target-head)
logits: vanilla (pure embedding-rank bias), gated (hidden-conditioned sigmoid
gate), rnn (minimal recurrent cell unrolled inside one block). The confidence
head predicts per-position acceptance probability. Parity with
specforge/modeling/draft/dspark.py:24-400.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from specforge_tpu.models.draft.base import register_draft
from specforge_tpu.models.draft.dflash import (
    DFlashConfig,
    DFlashDraftModel,
    KernelParam,
)


class VanillaMarkovHead(nn.Module):
    vocab_size: int
    markov_rank: int
    hidden_size: int
    head_type: str = "vanilla"
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.markov_w1 = nn.Embed(
            self.vocab_size, self.markov_rank, dtype=self.dtype,
            param_dtype=jnp.float32, name="markov_w1",
        )
        # raw kernel (same param path/shape/init as the nn.Dense it replaces)
        # so the fused objective can matmul it directly
        self.markov_w2 = KernelParam(
            (self.markov_rank, self.vocab_size), name="markov_w2"
        )
        self._setup_extra()

    def _setup_extra(self):
        pass

    def get_prev_embeddings(self, token_ids):
        return self.markov_w1(token_ids)

    def w2_kernel(self) -> jnp.ndarray:
        """Trainable bias-projection kernel [markov_rank, vocab]."""
        return self.markov_w2()

    def project_bias(self, latent):
        return latent.astype(self.dtype) @ self.markov_w2().astype(self.dtype)

    def block_latents(self, token_ids, hidden_states):
        """Pre-``markov_w2`` latent [..., block, markov_rank]; the logit bias
        is ``project_bias(block_latents(...))``."""
        return self.get_prev_embeddings(token_ids)

    def apply_block_logits(self, base_logits, *, token_ids, hidden_states):
        """base_logits [..., block, V]; token_ids [..., block] (prev tokens)."""
        latent = self.block_latents(token_ids, hidden_states)
        return base_logits + self.project_bias(latent).astype(base_logits.dtype)


class GatedMarkovHead(VanillaMarkovHead):
    head_type: str = "gated"

    def _setup_extra(self):
        self.gate_proj = nn.Dense(
            self.markov_rank, dtype=self.dtype, param_dtype=jnp.float32,
            name="gate_proj",
        )

    def block_latents(self, token_ids, hidden_states):
        if hidden_states is None:
            raise ValueError("gated Markov head requires hidden_states")
        prev = self.get_prev_embeddings(token_ids)
        gate_in = jnp.concatenate(
            [hidden_states.astype(prev.dtype), prev], axis=-1
        )
        gate = jax.nn.sigmoid(self.gate_proj(gate_in)).astype(prev.dtype)
        return gate * prev


class RNNMarkovHead(VanillaMarkovHead):
    head_type: str = "rnn"

    def _setup_extra(self):
        self.joint_proj = nn.Dense(
            3 * self.markov_rank, dtype=self.dtype, param_dtype=jnp.float32,
            name="joint_proj",
        )

    def block_latents(self, token_ids, hidden_states):
        if hidden_states is None:
            raise ValueError("rnn Markov head requires hidden_states")
        r = self.markov_rank
        block = token_ids.shape[-1]

        # joint_proj is linear over concat(state, prev_emb, hidden): the
        # prev_emb/hidden (+bias) part is recurrence-independent, so it runs
        # as ONE batched Dense call over all block steps (zero state slot);
        # only the tiny state @ K[:r] matmul stays inside the unrolled loop
        prev_all = self.get_prev_embeddings(token_ids)   # [.., block, r]
        hid = hidden_states.astype(prev_all.dtype)
        static = self.joint_proj(jnp.concatenate(
            [jnp.zeros_like(prev_all), prev_all, hid], axis=-1
        ))                                               # [.., block, 3r]
        k_state = self.joint_proj.variables["params"]["kernel"][:r].astype(
            self.dtype
        )

        state = jnp.zeros((*token_ids.shape[:-1], r), self.dtype)
        outs = []
        for step in range(block):
            raw = static[..., step, :] + state @ k_state
            gate = jax.nn.sigmoid(raw[..., :r])
            candidate = jnp.tanh(raw[..., r:2 * r])
            outs.append(jnp.tanh(raw[..., 2 * r:]))
            state = gate * state + (1.0 - gate) * candidate
        # single [.., block, rank] @ [rank, V] matmul instead of per-step
        # projections (the recurrence itself stays sequential)
        return jnp.stack(outs, axis=-2)


class AcceptRatePredictor(nn.Module):
    """Per-position acceptance-probability logit."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features):
        proj = nn.Dense(
            1, dtype=self.dtype, param_dtype=jnp.float32, name="proj"
        )
        return proj(features)[..., 0]


@register_draft
class DSparkDraftModel(DFlashDraftModel):
    """DFlash backbone with DSpark Markov/confidence heads."""

    def _init_draft_head(self) -> None:
        cfg = self.config
        if cfg.projector_type not in (None, "dspark"):
            raise ValueError(
                "DSparkDraftModel requires projector_type='dspark', got "
                f"{cfg.projector_type!r}"
            )
        if cfg.markov_rank > 0:
            head_cls = {
                "vanilla": VanillaMarkovHead,
                "gated": GatedMarkovHead,
                "rnn": RNNMarkovHead,
            }[cfg.markov_head_type]
            self.markov_head = head_cls(
                vocab_size=cfg.vocab_size,
                markov_rank=cfg.markov_rank,
                hidden_size=cfg.hidden_size,
                dtype=self.dtype,
                name="markov_head",
            )
        else:
            self.markov_head = None
        if cfg.confidence_head_with_markov and self.markov_head is None:
            raise ValueError(
                "confidence_head_with_markov=True requires markov_rank > 0"
            )
        if cfg.enable_confidence_head:
            self.confidence_head = AcceptRatePredictor(
                dtype=self.dtype, name="confidence_head"
            )
        else:
            self.confidence_head = None

    def apply_logits_head(
        self,
        base_logits,
        *,
        prev_token_ids=None,
        prev_token_embeddings=None,
        hidden_states,
    ):
        if self.markov_head is None:
            return base_logits
        if prev_token_ids is None:
            raise ValueError("DSparkDraftModel requires prev_token_ids")
        return self.markov_head.apply_block_logits(
            base_logits, token_ids=prev_token_ids, hidden_states=hidden_states
        )

    def markov_latents(self, prev_token_ids, hidden_states):
        """Pre-projection Markov latent [..., block, rank] (None if no head)."""
        if self.markov_head is None:
            return None
        return self.markov_head.block_latents(prev_token_ids, hidden_states)

    def markov_kernel(self):
        """Trainable Markov bias kernel [rank, vocab] (None if no head)."""
        if self.markov_head is None:
            return None
        return self.markov_head.w2_kernel()

    def predict_confidence(self, hidden_states, *, prev_token_ids=None):
        if self.confidence_head is None:
            return None
        if self.config.confidence_head_with_markov:
            if prev_token_ids is None:
                raise ValueError(
                    "prev_token_ids is required for Markov confidence"
                )
            prev = self.markov_head.get_prev_embeddings(prev_token_ids).astype(
                hidden_states.dtype
            )
            hidden_states = jnp.concatenate([hidden_states, prev], axis=-1)
        return self.confidence_head(hidden_states)
