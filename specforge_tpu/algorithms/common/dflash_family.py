"""DFlash-family training wrappers (DFlash / Domino / DSpark).

Behavioral parity with specforge/algorithms/common/dflash_family_model.py:
anchors sampled from doubly-supervised positions, mask-token query blocks,
same-position labels (block pos k → token anchor+k; DSpark shifts to anchor+1+k),
frozen target ``lm_head``/``embed_tokens`` (passed as explicit arrays so the
1.2GB tables are never traced as constants), and the per-family losses:

- DFlash: masked CE (optional exp position decay, optional D-PACE
  confidence-weight variants) with the ``loss_terms`` numerator/denominator
  contract for cross-window gradient normalization.
- Domino: GRU-corrected final CE blended with base CE by a decaying
  ``lambda_base``; per-block accept-length telemetry.
- DSpark: Markov-corrected CE + L1(draft_probs, teacher_probs) +
  confidence-head BCE, token-pooled with a global denominator.

TPU notes: anchor count is static (``num_anchors``), invalid anchors ride a
keep-mask; randomness is keyed (``rng`` argument — fold in the step for
topology-independent parity); the full-vocab logit memory is bounded by
``checkpointed_chunk_reduce`` over anchor chunks.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from specforge_tpu.models.draft.dflash import DFlashDraftModel
from specforge_tpu.ops.chunking import checkpointed_chunk_reduce
from specforge_tpu.ops.fused_objective import (
    _DFlashOpts,
    _DominoOpts,
    _DSparkOpts,
    compute_accept_len,
    dflash_objective_fused,
    domino_objective_fused,
    dpace_weight,
    dspark_objective_fused,
    masked_cross_entropy,
)
from specforge_tpu.ops.masks import sample_anchor_positions

_VALID_LOSS_TYPES = {
    "dflash",
    "dpace",
    "dpace-cumulative-confidence-only",
    "dpace-continuation-value-only",
}
_DPACE_LOSS_TYPES = _VALID_LOSS_TYPES - {"dflash"}

# masked_cross_entropy / compute_accept_len / dpace_weight live in
# ops/fused_objective.py — one source for the fused and checkpointed paths
# (the fused=unfused parity tests depend on the math staying identical).


class OnlineDFlashModel(nn.Module):
    draft_model: DFlashDraftModel
    mask_token_id: int
    block_size: int = 16
    num_anchors: int = 512
    loss_decay_gamma: Optional[float] = None
    objective_chunk_blocks: int = 128
    loss_type: str = "dflash"
    dpace_alpha: float = 0.5
    # Fused objective: frozen-head CE with forward-computed input gradients
    # (ops/fused_objective.py) — 2 vocab matmuls per chunk instead of the
    # checkpointed path's 3 (fwd + remat + d_hidden). Same math; the unfused
    # path is kept for parity testing.
    fused_objective: bool = True

    def _check(self):
        if self.loss_type not in _VALID_LOSS_TYPES:
            raise ValueError(
                f"loss_type={self.loss_type!r}; one of {sorted(_VALID_LOSS_TYPES)}"
            )
        if not 0.0 <= self.dpace_alpha <= 1.0:
            raise ValueError(f"dpace_alpha must be in [0,1], got {self.dpace_alpha}")

    # --- shared block machinery -----------------------------------------
    def _noise_embeddings(
        self, input_ids, anchor_positions, block_keep_mask, embed_weight
    ):
        b, s = input_ids.shape
        n = anchor_positions.shape[1]
        anchor_tokens = jnp.take_along_axis(
            input_ids, jnp.clip(anchor_positions, 0, s - 1), axis=1
        )
        first = jnp.where(block_keep_mask, anchor_tokens, self.mask_token_id)
        rest = jnp.full(
            (b, n, self.block_size - 1), self.mask_token_id, input_ids.dtype
        )
        noise_ids = jnp.concatenate([first[..., None], rest], axis=-1)
        noise_ids = noise_ids.reshape(b, n * self.block_size)
        return jnp.take(embed_weight, noise_ids, axis=0), noise_ids

    def _positions(self, anchor_positions, seq_len):
        b, n = anchor_positions.shape
        ctx = jnp.broadcast_to(
            jnp.arange(seq_len, dtype=jnp.int32)[None], (b, seq_len)
        )
        offsets = jnp.arange(self.block_size, dtype=jnp.int32)
        draft = (anchor_positions[..., None] + offsets).reshape(b, -1)
        return ctx, draft

    def _forward_draft_blocks(
        self, input_ids, hidden_states, loss_mask, embed_weight, rng
    ):
        seq_len = input_ids.shape[1]
        anchor_positions, block_keep_mask = sample_anchor_positions(
            rng, loss_mask, self.num_anchors
        )
        noise_embedding, _ = self._noise_embeddings(
            input_ids, anchor_positions, block_keep_mask, embed_weight
        )
        ctx_pos, draft_pos = self._positions(anchor_positions, seq_len)
        output_hidden = self.draft_model(
            noise_embedding,
            hidden_states,
            ctx_pos,
            draft_pos,
            anchor_positions,
            block_keep_mask,
        )
        return anchor_positions, block_keep_mask, output_hidden

    def _gather_labels(self, input_ids, anchor_positions, start_offset=0):
        """target_ids [B, N, block] at anchor + start_offset + k, with bounds."""
        seq_len = input_ids.shape[1]
        offsets = jnp.arange(
            start_offset, start_offset + self.block_size, dtype=jnp.int32
        )
        label_indices = anchor_positions[..., None] + offsets
        valid = label_indices < seq_len
        safe = jnp.clip(label_indices, 0, seq_len - 1)
        target_ids = jnp.take_along_axis(
            input_ids[:, None, :], safe, axis=2
        )
        return target_ids, valid, safe

    def _dpace_weight(self, prob, binary_mask, binary_mask_b):
        return dpace_weight(
            prob, binary_mask, binary_mask_b, self.loss_type, self.dpace_alpha
        )

    def _objective_chunk_terms(self, lm_head_weight):
        def fn(hidden, target_ids, weight_mask):
            b, n, bs, h = hidden.shape
            logits = jnp.einsum(
                "bnkh,vh->bnkv", hidden, lm_head_weight.astype(hidden.dtype)
            )
            neg_log_q = masked_cross_entropy(logits, target_ids)

            if self.loss_type == "dflash":
                loss_weights = weight_mask
                if self.loss_decay_gamma and self.loss_decay_gamma > 0:
                    positions = jnp.arange(self.block_size, dtype=jnp.float32)
                    decay = jnp.exp(
                        -jnp.maximum(positions - 1, 0) / self.loss_decay_gamma
                    )
                    loss_weights = loss_weights * decay[None, None, :]
                loss_num = jnp.sum(neg_log_q * loss_weights)
                loss_den = jnp.sum(loss_weights)
            else:
                prob = jax.lax.stop_gradient(jnp.exp(-neg_log_q))
                dpace_w = jax.lax.stop_gradient(
                    self._dpace_weight(prob, weight_mask, weight_mask > 0)
                )
                loss_num = jnp.sum(neg_log_q * weight_mask * dpace_w)
                loss_den = jnp.zeros((), jnp.float32)

            predicted = jnp.argmax(logits, axis=-1)
            correct_num = jnp.sum(
                ((predicted == target_ids) & (weight_mask > 0.5)).astype(
                    jnp.float32
                )
            )
            accuracy_den = jnp.sum(weight_mask)
            return loss_num, loss_den, correct_num, accuracy_den

        return fn

    def __call__(
        self,
        input_ids: jnp.ndarray,      # [B, S]
        hidden_states: jnp.ndarray,  # [B, S, L*h] capture concat
        loss_mask: jnp.ndarray,      # [B, S] or [B, S, 1]
        lm_head_weight: jnp.ndarray,     # frozen [V, h]
        embed_weight: jnp.ndarray,       # frozen [V, h]
        rng: jax.Array,
    ):
        self._check()
        b, seq_len = input_ids.shape
        if loss_mask.ndim == 3:
            loss_mask = loss_mask[..., 0]

        anchor_positions, block_keep_mask, output_hidden = (
            self._forward_draft_blocks(
                input_ids, hidden_states, loss_mask, embed_weight, rng
            )
        )

        target_ids, valid, safe = self._gather_labels(
            input_ids, anchor_positions, start_offset=0
        )
        weight_mask = (
            block_keep_mask[..., None].astype(jnp.float32)
            * valid.astype(jnp.float32)
        )
        pos_in_block = jnp.arange(self.block_size)
        weight_mask = weight_mask * (pos_in_block > 0)[None, None, :]
        lm_gathered = jnp.take_along_axis(
            loss_mask[:, None, :].astype(jnp.float32), safe, axis=2
        )
        weight_mask = weight_mask * lm_gathered

        n = anchor_positions.shape[1]
        hidden_4d = output_hidden.reshape(b, n, self.block_size, -1)
        if self.fused_objective:
            loss_weights = weight_mask
            if (
                self.loss_type == "dflash"
                and self.loss_decay_gamma
                and self.loss_decay_gamma > 0
            ):
                positions = jnp.arange(self.block_size, dtype=jnp.float32)
                decay = jnp.exp(
                    -jnp.maximum(positions - 1, 0) / self.loss_decay_gamma
                )
                loss_weights = weight_mask * decay[None, None, :]
            loss_num, loss_den, correct_num, accuracy_den = (
                dflash_objective_fused(
                    hidden_4d, target_ids, loss_weights, weight_mask,
                    lm_head_weight,
                    _DFlashOpts(
                        loss_type=self.loss_type,
                        dpace_alpha=float(self.dpace_alpha),
                        chunk_blocks=int(self.objective_chunk_blocks),
                    ),
                )
            )
        else:
            loss_num, loss_den, correct_num, accuracy_den = (
                checkpointed_chunk_reduce(
                    self._objective_chunk_terms(lm_head_weight),
                    hidden_4d, target_ids, weight_mask,
                    chunk_size=self.objective_chunk_blocks, axis=1,
                    initializing=self.is_initializing(),
                )
            )
        loss_denominator = (
            loss_den if self.loss_type == "dflash" else jnp.asarray(float(b))
        )
        loss = loss_num / jnp.maximum(loss_denominator, 1e-6)
        accuracy = correct_num / jnp.maximum(accuracy_den, 1e-6)
        metrics = {
            "accuracy_denom": accuracy_den,
            "ratio_metrics": {"acc": (correct_num, accuracy_den)},
            "loss_terms": (loss_num, jax.lax.stop_gradient(loss_denominator)),
        }
        return loss, accuracy, metrics


class OnlineDominoModel(OnlineDFlashModel):
    """Domino: DFlash blocks + GRU-corrected logits, decaying base blend."""

    shift_label: bool = False

    def __call__(
        self,
        input_ids,
        hidden_states,
        loss_mask,
        lm_head_weight,
        embed_weight,
        rng,
        lambda_base=0.0,
    ):
        b, seq_len = input_ids.shape
        if loss_mask.ndim == 3:
            loss_mask = loss_mask[..., 0]
        anchor_positions, block_keep_mask, output_hidden = (
            self._forward_draft_blocks(
                input_ids, hidden_states, loss_mask, embed_weight, rng
            )
        )

        label_start = 1 if self.shift_label else 0
        target_ids, valid, safe = self._gather_labels(
            input_ids, anchor_positions, start_offset=label_start
        )
        n = anchor_positions.shape[1]
        hidden4d = output_hidden.reshape(b, n, self.block_size, -1)

        if self.shift_label:
            prev_offsets = jnp.arange(self.block_size, dtype=jnp.int32)
            prev_idx = jnp.clip(
                anchor_positions[..., None] + prev_offsets, 0, seq_len - 1
            )
            prev_ids = jnp.take_along_axis(
                input_ids[:, None, :], prev_idx, axis=2
            )
        else:
            prev_ids = target_ids

        weight_mask = (
            block_keep_mask[..., None].astype(jnp.float32)
            * valid.astype(jnp.float32)
        )
        if not self.shift_label:
            pos_in_block = jnp.arange(self.block_size)
            weight_mask = weight_mask * (pos_in_block > 0)[None, None, :]
        lm_gathered = jnp.take_along_axis(
            loss_mask[:, None, :].astype(jnp.float32), safe, axis=2
        )
        weight_mask = weight_mask * lm_gathered
        eval_weight_mask = weight_mask

        if self.loss_decay_gamma and self.loss_decay_gamma > 0:
            k = jnp.arange(self.block_size, dtype=jnp.float32)
            offset = 0 if self.shift_label else 1
            decay = jnp.exp(-jnp.maximum(k - offset, 0) / self.loss_decay_gamma)
            weight_mask = weight_mask * decay[None, None, :]

        if self.fused_objective:
            prev_emb = jnp.take(embed_weight, prev_ids, axis=0)
            corr_act = self.draft_model.correction_activation(
                prev_emb, hidden4d
            )
            p1_kernel = self.draft_model.logits_head_kernel()
            (
                blend_num, final_num, base_num, loss_den, correct_num,
                base_correct, accuracy_den, accept_num, base_accept_num,
                accept_den,
            ) = domino_objective_fused(
                hidden4d, corr_act, p1_kernel, target_ids, weight_mask,
                eval_weight_mask, jnp.asarray(lambda_base, jnp.float32),
                lm_head_weight,
                _DominoOpts(chunk_blocks=int(self.objective_chunk_blocks)),
            )
            valid_token_count = loss_den + 1e-6
            final_loss = final_num / valid_token_count
            base_loss = base_num / valid_token_count
            loss = blend_num / valid_token_count
            return self._domino_outputs(
                loss, final_loss, base_loss, correct_num, base_correct,
                accuracy_den, accept_num, base_accept_num, accept_den,
                lambda_base,
            )

        def chunk_fn(hidden, prev_ids_c, target_ids_c, w_mask, ew_mask):
            base_logits = jnp.einsum(
                "bnkh,vh->bnkv", hidden, lm_head_weight.astype(hidden.dtype)
            )
            prev_emb = jnp.take(embed_weight, prev_ids_c, axis=0)
            final_logits = self.draft_model.apply_logits_head(
                base_logits,
                prev_token_embeddings=prev_emb,
                hidden_states=hidden,
            )
            final_ce = masked_cross_entropy(final_logits, target_ids_c)
            base_ce = masked_cross_entropy(base_logits, target_ids_c)
            final_num = jnp.sum(final_ce * w_mask)
            base_num = jnp.sum(base_ce * w_mask)
            loss_den = jnp.sum(w_mask)

            predicted = jnp.argmax(final_logits, axis=-1)
            base_pred = jnp.argmax(base_logits, axis=-1)
            bin_mask = ew_mask > 0.5
            correct_num = jnp.sum(
                ((predicted == target_ids_c) & bin_mask).astype(jnp.float32)
            )
            base_correct = jnp.sum(
                ((base_pred == target_ids_c) & bin_mask).astype(jnp.float32)
            )
            accuracy_den = jnp.sum(ew_mask)

            valid_mask = ew_mask > 0
            accepted = compute_accept_len(predicted, target_ids_c, valid_mask)
            base_accepted = compute_accept_len(
                base_pred, target_ids_c, valid_mask
            )
            valid_blocks = jnp.any(valid_mask, axis=-1).astype(jnp.float32)
            accept_num = jnp.sum((accepted + 1.0) * valid_blocks)
            base_accept_num = jnp.sum((base_accepted + 1.0) * valid_blocks)
            accept_den = jnp.sum(valid_blocks)
            return (
                final_num, base_num, loss_den, correct_num, base_correct,
                accuracy_den, accept_num, base_accept_num, accept_den,
            )

        (
            final_num, base_num, loss_den, correct_num, base_correct,
            accuracy_den, accept_num, base_accept_num, accept_den,
        ) = checkpointed_chunk_reduce(
            chunk_fn, hidden4d, prev_ids, target_ids, weight_mask,
            eval_weight_mask, chunk_size=self.objective_chunk_blocks, axis=1,
            initializing=self.is_initializing(),
        )

        valid_token_count = loss_den + 1e-6
        final_loss = final_num / valid_token_count
        base_loss = base_num / valid_token_count
        loss = (1.0 - lambda_base) * final_loss + lambda_base * base_loss
        return self._domino_outputs(
            loss, final_loss, base_loss, correct_num, base_correct,
            accuracy_den, accept_num, base_accept_num, accept_den, lambda_base,
        )

    def _domino_outputs(
        self, loss, final_loss, base_loss, correct_num, base_correct,
        accuracy_den, accept_num, base_accept_num, accept_den, lambda_base,
    ):
        accuracy = correct_num / (accuracy_den + 1e-6)
        metrics = {
            "final_loss": jax.lax.stop_gradient(final_loss),
            "base_loss": jax.lax.stop_gradient(base_loss),
            "base_accuracy": jax.lax.stop_gradient(
                base_correct / (accuracy_den + 1e-6)
            ),
            "accept_len": accept_num / (accept_den + 1e-6),
            "base_accept_len": base_accept_num / (accept_den + 1e-6),
            "lambda_base": jnp.asarray(lambda_base, jnp.float32),
            "accuracy_denom": accuracy_den,
        }
        return loss, accuracy, metrics


class OnlineDSparkModel(OnlineDFlashModel):
    """DSpark: Markov-corrected CE + L1 to teacher probs + confidence BCE."""

    dspark_ce_loss_alpha: float = 0.1
    dspark_l1_loss_alpha: float = 0.9
    dspark_confidence_head_alpha: float = 1.0

    def _labels_and_mask(self, input_ids, loss_mask, anchor_positions,
                         block_keep_mask):
        seq_len = input_ids.shape[1]
        offsets = jnp.arange(1, self.block_size + 1, dtype=jnp.int32)
        label_indices = anchor_positions[..., None] + offsets
        safe = jnp.clip(label_indices, 0, seq_len - 1)
        safe = jnp.where(block_keep_mask[..., None], safe, 0)
        target_ids = jnp.take_along_axis(input_ids[:, None, :], safe, axis=2)

        target_valid = label_indices < seq_len
        target_lm = jnp.take_along_axis(
            loss_mask[:, None, :].astype(jnp.float32), safe, axis=2
        )
        eval_mask = target_valid & (target_lm > 0.5)
        eval_mask = eval_mask & block_keep_mask[..., None]
        eval_mask = jnp.cumprod(eval_mask.astype(jnp.int32), axis=-1) > 0
        return target_ids, eval_mask, safe

    def _loss_weights(self, eval_mask):
        w = eval_mask.astype(jnp.float32)
        if self.loss_decay_gamma and self.loss_decay_gamma > 0:
            positions = jnp.arange(self.block_size, dtype=jnp.float32)
            w = w * jnp.exp(-positions / float(self.loss_decay_gamma))[
                None, None, :
            ]
        return w

    def __call__(
        self,
        input_ids,
        hidden_states,
        loss_mask,
        lm_head_weight,
        embed_weight,
        rng,
        target_last_hidden_states=None,
    ):
        b, seq_len = input_ids.shape
        if loss_mask.ndim == 3:
            loss_mask = loss_mask[..., 0]
        anchor_positions, block_keep_mask, output_hidden = (
            self._forward_draft_blocks(
                input_ids, hidden_states, loss_mask, embed_weight, rng
            )
        )
        target_ids, eval_mask, safe_idx = self._labels_and_mask(
            input_ids, loss_mask, anchor_positions, block_keep_mask
        )
        anchor_tokens = jnp.take_along_axis(input_ids, anchor_positions, axis=1)
        prev_token_ids = jnp.concatenate(
            [anchor_tokens[..., None], target_ids[..., :-1]], axis=-1
        )

        n = anchor_positions.shape[1]
        hidden_4d = output_hidden.reshape(b, n, self.block_size, -1)
        loss_weights = self._loss_weights(eval_mask)
        loss_den = jnp.sum(loss_weights)

        need_target = self.dspark_l1_loss_alpha > 0 or (
            self.dspark_confidence_head_alpha > 0
        )
        aligned_target_hidden = None
        if need_target and target_last_hidden_states is not None:
            # the target state that *predicts* each label token sits one
            # position before it (reference _aligned_target_hidden)
            pred_idx = jnp.maximum(safe_idx - 1, 0)
            h = target_last_hidden_states.shape[-1]
            aligned_target_hidden = jnp.take_along_axis(
                target_last_hidden_states,
                pred_idx.reshape(b, -1)[..., None],
                axis=1,
            ).reshape(b, n, self.block_size, h)

        if self.fused_objective:
            return self._fused_call(
                hidden_4d, prev_token_ids, target_ids, loss_weights,
                eval_mask, aligned_target_hidden, lm_head_weight, loss_den,
            )

        def chunk_fn(hidden, prev_ids_c, target_ids_c, lw, em, ath):
            base_logits = jnp.einsum(
                "bnkh,vh->bnkv", hidden, lm_head_weight.astype(hidden.dtype)
            )
            draft_logits = self.draft_model.apply_logits_head(
                base_logits, prev_token_ids=prev_ids_c, hidden_states=hidden
            )
            ce = masked_cross_entropy(draft_logits, target_ids_c)
            ce_num = jnp.sum(ce * lw)

            zero = jnp.zeros((), jnp.float32)
            l1_num = conf_num = conf_err = zero
            agree_num = t_top1 = d_top1 = tau_num = tau_den = zero
            accept_probability = None
            if ath is not None:
                target_logits = jax.lax.stop_gradient(
                    jnp.einsum(
                        "bnkh,vh->bnkv", ath, lm_head_weight.astype(ath.dtype)
                    )
                )
                target_probs = jax.nn.softmax(
                    target_logits.astype(jnp.float32), axis=-1
                )
                teacher_ids = jnp.argmax(target_logits, axis=-1)
                draft_probs = jax.nn.softmax(
                    draft_logits.astype(jnp.float32), axis=-1
                )
                l1_per_token = jnp.sum(
                    jnp.abs(draft_probs - target_probs), axis=-1
                )
                accept_probability = jnp.clip(
                    1.0 - 0.5 * l1_per_token, 0.0, 1.0
                )
                if self.dspark_l1_loss_alpha > 0:
                    l1_num = jnp.sum(l1_per_token * lw)

            conf_pred = self.draft_model.predict_confidence(
                hidden, prev_token_ids=prev_ids_c
            )
            if conf_pred is not None and self.dspark_confidence_head_alpha > 0:
                if accept_probability is None:
                    raise ValueError(
                        "DSpark confidence loss requires target_last_hidden_states"
                    )
                ap = jax.lax.stop_gradient(accept_probability)
                logits_f = conf_pred.astype(jnp.float32)
                conf_per_token = (
                    jnp.maximum(logits_f, 0)
                    - logits_f * ap
                    + jnp.log1p(jnp.exp(-jnp.abs(logits_f)))
                )
                conf_num = jnp.sum(conf_per_token * lw)
                conf_err = jnp.sum(
                    jnp.abs(jax.nn.sigmoid(logits_f) - accept_probability) * lw
                )

            predicted = jnp.argmax(draft_logits, axis=-1)
            emf = em.astype(jnp.float32)
            correct = ((predicted == target_ids_c) & em).astype(jnp.float32)
            correct_num = jnp.sum(correct)
            eval_den = jnp.sum(emf)
            ce_pos = jnp.sum(jax.lax.stop_gradient(ce) * emf, axis=(0, 1))
            correct_pos = jnp.sum(correct, axis=(0, 1))
            pos_den = jnp.sum(emf, axis=(0, 1))
            if ath is not None:
                agree_num = jnp.sum(
                    (predicted == teacher_ids).astype(jnp.float32) * emf
                )
                t_top1 = jnp.sum(jnp.max(target_probs, axis=-1) * emf)
                d_top1 = jnp.sum(jnp.max(draft_probs, axis=-1) * emf)
                valid_blocks = jnp.any(em, axis=-1).astype(jnp.float32)
                accepted_exp = (
                    jnp.sum(
                        jnp.cumprod(
                            jax.lax.stop_gradient(accept_probability) * emf,
                            axis=-1,
                        ),
                        axis=-1,
                    )
                    + 1.0
                )
                tau_num = jnp.sum(accepted_exp * valid_blocks)
                tau_den = jnp.sum(valid_blocks)
            return (
                ce_num, l1_num, conf_num, conf_err, correct_num, eval_den,
                ce_pos, correct_pos, pos_den, agree_num, t_top1, d_top1,
                tau_num, tau_den,
            )

        totals = checkpointed_chunk_reduce(
            chunk_fn, hidden_4d, prev_token_ids, target_ids, loss_weights,
            eval_mask, aligned_target_hidden,
            chunk_size=self.objective_chunk_blocks, axis=1,
            initializing=self.is_initializing(),
        )
        (
            ce_num, l1_num, conf_num, conf_err, correct_num, eval_den,
            ce_pos, correct_pos, pos_den, agree_num, t_top1, d_top1,
            tau_num, tau_den,
        ) = totals

        # Under jit sharding every sum above is already global; the loss is the
        # globally-normalized objective (reference all-reduces loss_den and
        # rescales by world_size to undo DDP grad averaging — equivalent here).
        global_den = jnp.maximum(jax.lax.stop_gradient(loss_den), 1e-6)
        loss = (
            self.dspark_ce_loss_alpha * ce_num
            + self.dspark_l1_loss_alpha * l1_num
            + self.dspark_confidence_head_alpha * conf_num
        ) / global_den
        return self._dspark_outputs(
            loss, ce_num, l1_num, conf_num, conf_err, correct_num, eval_den,
            agree_num, t_top1, d_top1, tau_num, tau_den, loss_den,
        )

    def _fused_call(self, hidden_4d, prev_token_ids, target_ids, loss_weights,
                    eval_mask, aligned_target_hidden, lm_head_weight,
                    loss_den):
        """Fused-objective DSpark: the two full-vocab paths (draft CE+L1,
        teacher projection) run once each inside ``dspark_objective_fused``;
        the tiny confidence BCE is ordinary autodiff outside, consuming the
        op's stop-gradient acceptance probability."""
        latent = self.draft_model.markov_latents(prev_token_ids, hidden_4d)
        w2 = self.draft_model.markov_kernel()
        has_markov = latent is not None
        if not has_markov:
            latent = jnp.zeros((*hidden_4d.shape[:3], 1), hidden_4d.dtype)
            w2 = jnp.zeros((1, 1), jnp.float32)
        has_target = aligned_target_hidden is not None
        ath = (
            aligned_target_hidden
            if has_target
            else jnp.zeros((*hidden_4d.shape[:3], 1), hidden_4d.dtype)
        )
        (
            vocab_num, ce_num, l1_num, correct_num, eval_den, _ce_pos,
            _correct_pos, _pos_den, agree_num, t_top1, d_top1, tau_num,
            tau_den, accept_probability,
        ) = dspark_objective_fused(
            hidden_4d, latent, w2, ath, target_ids, loss_weights,
            eval_mask, lm_head_weight,
            _DSparkOpts(
                chunk_blocks=int(self.objective_chunk_blocks),
                ce_alpha=float(self.dspark_ce_loss_alpha),
                l1_alpha=float(self.dspark_l1_loss_alpha),
                has_markov=has_markov,
                has_target=has_target,
            ),
        )

        zero = jnp.zeros((), jnp.float32)
        conf_num = conf_err = zero
        conf_pred = self.draft_model.predict_confidence(
            hidden_4d, prev_token_ids=prev_token_ids
        )
        if conf_pred is not None and self.dspark_confidence_head_alpha > 0:
            if not has_target:
                raise ValueError(
                    "DSpark confidence loss requires target_last_hidden_states"
                )
            ap = jax.lax.stop_gradient(accept_probability)
            logits_f = conf_pred.astype(jnp.float32)
            conf_per_token = (
                jnp.maximum(logits_f, 0)
                - logits_f * ap
                + jnp.log1p(jnp.exp(-jnp.abs(logits_f)))
            )
            conf_num = jnp.sum(conf_per_token * loss_weights)
            conf_err = jnp.sum(
                jnp.abs(jax.nn.sigmoid(logits_f) - ap) * loss_weights
            )

        global_den = jnp.maximum(jax.lax.stop_gradient(loss_den), 1e-6)
        loss = (
            vocab_num + self.dspark_confidence_head_alpha * conf_num
        ) / global_den
        return self._dspark_outputs(
            loss, ce_num, l1_num, conf_num, conf_err, correct_num, eval_den,
            agree_num, t_top1, d_top1, tau_num, tau_den, loss_den,
        )

    def _dspark_outputs(self, loss, ce_num, l1_num, conf_num, conf_err,
                        correct_num, eval_den, agree_num, t_top1, d_top1,
                        tau_num, tau_den, loss_den):
        ratio_metrics = {
            "acc": (correct_num, eval_den),
            "ce_loss": (jax.lax.stop_gradient(ce_num), loss_den),
            "l1_loss": (jax.lax.stop_gradient(l1_num), loss_den),
            "confidence_loss": (jax.lax.stop_gradient(conf_num), loss_den),
            "confidence_abs_error": (jax.lax.stop_gradient(conf_err), loss_den),
            "teacher_agreement": (agree_num, eval_den),
            "teacher_top1_prob": (t_top1, eval_den),
            "draft_top1_prob": (d_top1, eval_den),
            "tau_probabilistic": (tau_num, tau_den),
        }
        metrics = {
            "ratio_metrics": ratio_metrics,
            "accuracy_denom": eval_den,
        }
        accuracy = correct_num / jnp.maximum(eval_den, 1.0)
        return loss, accuracy, metrics
