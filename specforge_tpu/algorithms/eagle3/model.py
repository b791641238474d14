"""EAGLE3 test-time-training (TTT) wrapper.

The TTT loop is Python-unrolled (``length`` is static) inside one jitted train
step: per step the draft predicts one token further ahead; its K/V join the
branch cache so later steps attend to them diagonally. Semantics follow
specforge/algorithms/eagle3/model.py:100-501:

1. Teacher projection to the draft vocab (full-vocab logits path or the
   compact from-hidden path), padded by ``length`` along the sequence.
2. ``fc`` projection of the 3-layer aux hidden concat.
3. Per step: slice teacher by step index → embed ids → decoder step with
   branch-cache attention (RoPE offset = branch index) → draft logits →
   fused CE + acceptance metrics → shift ids/masks one position left.

All teacher tensors are stop-gradiented. Outputs are stacked per-step arrays so
the strategy can apply the ``ploss_decay`` weighting and the trainer can reduce
metrics as numerator/denominator pairs.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from specforge_tpu.models.draft.llama_eagle3 import LlamaEagle3Draft
from specforge_tpu.ops.attention import make_causal_bias
from specforge_tpu.ops.lk_loss import compute_acceptance_rate, compute_lk_loss
from specforge_tpu.ops.loss import log_softmax_loss
from specforge_tpu.ops.teacher import (
    compute_target_p_padded,
    compute_target_p_padded_from_hidden,
)
from specforge_tpu.utils import shift_pad


class TTTOutputs(NamedTuple):
    """Per-TTT-step arrays, each of shape [length] (loss keeps grad).

    ``acceptance_nums``/``acceptance_denoms`` carry the masked acceptance sum
    and mask count separately so the evaluator can reduce across batches and
    ranks before dividing (batch-size-invariant eval contract)."""

    plosses: jnp.ndarray
    acceptance_rates: jnp.ndarray
    acces: jnp.ndarray
    metric_corrects: jnp.ndarray
    metric_denoms: jnp.ndarray
    metric_losses: jnp.ndarray
    metric_loss_denoms: jnp.ndarray
    acceptance_nums: jnp.ndarray
    acceptance_denoms: jnp.ndarray


class OnlineEagle3Model(nn.Module):
    """TTT training model over a draft submodule (named ``draft_model`` so the
    parameter tree matches the reference checkpoint layout)."""

    draft_model: LlamaEagle3Draft
    length: int = 7
    lk_loss_type: Optional[str] = None
    kl_scale: float = 1.0
    kl_decay: float = 1.0
    #: dtype for the stored teacher distribution (None = fp32 parity; bf16
    #: halves the live teacher + loss-residual HBM at large draft vocabs)
    teacher_dtype: Optional[Any] = None
    # mesh axis names to psum loss-metric numerators/denominators over
    # (the sequence-parallel group in USP runs); empty = local.
    metric_reduce_axes: Tuple[str, ...] = ()

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        loss_mask: jnp.ndarray,
        hidden_states: jnp.ndarray,
        target: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        target_hidden_for_compact: Optional[jnp.ndarray] = None,
        target_head_weight: Optional[jnp.ndarray] = None,
        compact_teacher_chunk_size: int = 32768,
    ) -> TTTOutputs:
        """Args (shapes per the reference contract):

        input_ids      [B, S] int — already teacher-shifted by the target head
                       preprocess (next-token alignment).
        attention_mask [B, S] — 1 for real tokens.
        loss_mask      [B, S, 1] — supervised positions.
        hidden_states  [B, S, 3*target_hidden] aux-layer concat.
        target         [B, S, V] full-vocab teacher logits (or None when the
                       compact path supplies hidden + head weight).
        """
        draft = self.draft_model
        t2d, d2t = draft.get_vocab_maps()

        if target_hidden_for_compact is not None:
            teacher = compute_target_p_padded_from_hidden(
                target_hidden_for_compact,
                target_head_weight,
                t2d,
                d2t,
                loss_mask,
                self.length,
                chunk_size=compact_teacher_chunk_size,
            )
        else:
            teacher = compute_target_p_padded(
                target, t2d, d2t, loss_mask, self.length
            )
        (
            target_p_padded,
            accept_ratio_padded,  # p_on_draft == target_p * ratio (exact)
            target_token_ids_padded,
            position_mask,
        ) = jax.tree_util.tree_map(jax.lax.stop_gradient, teacher)
        if self.teacher_dtype is not None:
            target_p_padded = target_p_padded.astype(self.teacher_dtype)

        batch_size, seq_len = input_ids.shape
        hidden = draft.project_hidden_states(hidden_states)
        if draft.attention_backend in ("usp", "pallas"):
            # these backends never materialize the [S, S] bias; padding rides
            # the [B, S] key-validity mask
            bias, key_valid = None, attention_mask
        else:
            bias = make_causal_bias(attention_mask, batch_size, seq_len)
            key_valid = None
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                jnp.arange(seq_len, dtype=jnp.int32)[None], (batch_size, seq_len)
            )
        elif position_ids.ndim == 3:
            # batch-first mrope ids [B, 3, S] (the collator layout) → rope's
            # [3, B, S] axis-major convention
            position_ids = jnp.moveaxis(position_ids, 1, 0)

        cache: Tuple[tuple, tuple] = ((), ())
        cur_input_ids = input_ids
        cur_loss_mask = loss_mask
        cur_position_mask = position_mask

        plosses, acceptance_rates, acces = [], [], []
        corrects, denoms, metric_losses, loss_denoms = [], [], [], []
        acceptance_nums, acceptance_denoms = [], []

        for idx in range(self.length):
            step_target_p = jax.lax.dynamic_slice_in_dim(
                target_p_padded, idx, seq_len, axis=1
            )
            step_ratio = jax.lax.dynamic_slice_in_dim(
                accept_ratio_padded, idx, seq_len, axis=1
            )
            step_token_ids = jax.lax.dynamic_slice_in_dim(
                target_token_ids_padded, idx, seq_len, axis=1
            )

            embeds = draft.embed_input_ids(cur_input_ids).astype(hidden.dtype)
            hidden, cache = draft.ttt_step(
                embeds, hidden, cache, bias, position_ids, key_valid
            )
            logits = draft.compute_logits(hidden)

            # --- metrics (token accuracy vs teacher argmax) ---
            pred_draft = jnp.argmax(logits, axis=-1)
            pred_target = pred_draft + jnp.take(d2t, pred_draft)
            lm = cur_loss_mask[..., 0].astype(jnp.float32)
            correct = jnp.sum(
                (pred_target == step_token_ids).astype(jnp.float32) * lm
            )
            denom = jnp.maximum(jnp.sum(lm), 1e-6)
            if self.metric_reduce_axes:
                correct = jax.lax.psum(correct, self.metric_reduce_axes)
                denom = jax.lax.psum(denom, self.metric_reduce_axes)
            acc = correct / denom

            # --- loss ---
            kl_loss = log_softmax_loss(logits, step_target_p, cur_position_mask)
            # the un-renormalized teacher is target_p * ratio, multiplied
            # chunk-wise inside the acceptance op (never materialized)
            acceptance_rate, log_acceptance_rate = compute_acceptance_rate(
                logits,
                step_target_p,
                cur_position_mask,
                reduce_axes=self.metric_reduce_axes or None,
                ratio=step_ratio,
            )
            if self.lk_loss_type is None:
                loss = kl_loss
                acceptance_rate = jax.lax.stop_gradient(acceptance_rate)
            else:
                loss = compute_lk_loss(
                    kl_loss,
                    acceptance_rate,
                    log_acceptance_rate,
                    self.lk_loss_type,
                    self.kl_scale,
                    self.kl_decay,
                )
            loss_denom = jnp.asarray(
                logits.shape[0] * logits.shape[1], jnp.float32
            )

            pos_den = jnp.sum(cur_position_mask.astype(jnp.float32))
            if self.metric_reduce_axes:
                pos_den = jax.lax.psum(pos_den, self.metric_reduce_axes)
            acceptance_nums.append(
                jax.lax.stop_gradient(acceptance_rate) * pos_den
            )
            acceptance_denoms.append(pos_den)

            plosses.append(loss)
            acceptance_rates.append(jax.lax.stop_gradient(acceptance_rate))
            acces.append(acc)
            corrects.append(correct)
            denoms.append(denom)
            metric_losses.append(jax.lax.stop_gradient(loss))
            loss_denoms.append(loss_denom)

            if idx != self.length - 1:
                cur_input_ids = shift_pad(cur_input_ids, left=False)
                cur_position_mask = shift_pad(cur_position_mask, left=False)
                cur_loss_mask = shift_pad(cur_loss_mask, left=False)

        return TTTOutputs(
            plosses=jnp.stack(plosses),
            acceptance_rates=jnp.stack(acceptance_rates),
            acces=jnp.stack(acces),
            metric_corrects=jnp.stack(corrects),
            metric_denoms=jnp.stack(denoms),
            metric_losses=jnp.stack(metric_losses),
            metric_loss_denoms=jnp.stack(loss_denoms),
            acceptance_nums=jnp.stack(acceptance_nums),
            acceptance_denoms=jnp.stack(acceptance_denoms),
        )
