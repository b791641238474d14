"""P-EAGLE chain-of-drafts (COD) training.

Semantics follow specforge/algorithms/peagle/model.py:13-347; the TPU
re-design replaces the dynamic-shape sampling/flex-attention with static
shapes:

- Depth 0 always covers all S positions. Depth d ≥ 1 has a **static capacity**
  ``cap_d = ceil(S · max(dsr^d, dsr_min))`` — an upper bound on the reference's
  dynamic ``sample_size = min(valid·ratio, #eligible)`` — and a per-slot
  validity mask carries the actual (traced) count. Total sampled length
  ``T = S + Σ cap_d`` is static, so one compiled program serves every batch.
- The COD attention predicate (same document ∧ (kv at depth 0 ∧ anchor-causal,
  or same rollout ∧ depth-ordered)) is evaluated as a dense [T, T] boolean
  allow-mask from the (anchor, depth, doc, valid) vectors.
- Sampling is keyed RNG (fold in the step, split per batch row) — the
  determinism contract for parity gates.

The reference constrains batch size to 1 per rank
(specforge/algorithms/peagle/model.py bs1 context); nothing in the math
requires it once shapes are static, so this model batches: the per-sample
sampler/mask vmap over the batch and the backbone/loss run once over
[B, T, ...] — bs>1 amortizes the 1.5B draft's HBM-bound master-parameter
traffic that makes bs1 the MFU floor (round-2 verdict W2). Packed documents
still ride the per-sample ``lengths`` vectors.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from specforge_tpu.models.draft.peagle import PEagleDraftModel, cod_capacities
from specforge_tpu.ops.loss import log_softmax_loss
from specforge_tpu.ops.teacher import draft_gather_indices


def document_ids_from_lengths(
    lengths: jnp.ndarray, seq_length: int
) -> jnp.ndarray:
    """[D] (0-padded) document lengths → per-position doc id, -1 past the end."""
    ends = jnp.cumsum(lengths)
    pos = jnp.arange(seq_length, dtype=lengths.dtype)
    doc = jnp.searchsorted(ends, pos, side="right").astype(jnp.int32)
    total = ends[-1]
    return jnp.where(pos < total, doc, -1)


class CODSample(NamedTuple):
    anchor_pos: jnp.ndarray  # [T] int32
    depth: jnp.ndarray       # [T] int32
    valid: jnp.ndarray       # [T] bool


def generate_cod_sample_indices(
    rng: jax.Array,
    loss_mask: jnp.ndarray,      # [S]
    doc_ids: jnp.ndarray,        # [S] int32, -1 = padding
    num_depths: int,
    down_sample_ratio: float,
    down_sample_ratio_min: float,
    filter_position_zero: bool = True,
) -> CODSample:
    s = loss_mask.shape[0]
    caps = cod_capacities(s, num_depths, down_sample_ratio,
                          down_sample_ratio_min)
    pos = jnp.arange(s, dtype=jnp.int32)
    all_valid = loss_mask > 0.5
    n_valid = jnp.sum(all_valid)

    anchors = [pos]
    depths = [jnp.zeros(s, jnp.int32)]
    valids = [jnp.ones(s, jnp.bool_)]

    prev_valid = all_valid  # mask over *target* positions
    for d in range(1, num_depths):
        cap = caps[d]
        ratio = max(down_sample_ratio ** d, down_sample_ratio_min)
        cand = prev_valid & (pos >= d)
        anchors_c = jnp.maximum(pos - d, 0)
        same_doc = (jnp.take(doc_ids, pos) >= 0) & (
            jnp.take(doc_ids, pos) == jnp.take(doc_ids, anchors_c)
        )
        eligible = cand & same_doc
        n_eligible = jnp.sum(eligible)
        valid_length = jnp.maximum(n_valid - d, 0)
        sample_size = jnp.minimum(
            (valid_length.astype(jnp.float32) * ratio).astype(jnp.int32),
            n_eligible,
        )

        rng, sub = jax.random.split(rng)
        rand = jnp.where(eligible, jax.random.uniform(sub, (s,)), 2.0)
        order = jnp.argsort(rand)[:cap].astype(jnp.int32)
        slot_keep = jnp.arange(cap) < jnp.minimum(sample_size, cap)
        sel = jnp.where(slot_keep, order, s)
        sel = jnp.sort(sel)
        keep = sel < s
        targets = jnp.where(keep, sel, 0)

        anchors.append(jnp.where(keep, targets - d, 0))
        depths.append(jnp.full(cap, d, jnp.int32))
        valids.append(keep)

        nxt = (targets + 1) % s
        keep_next = keep & jnp.take(all_valid, nxt)
        if filter_position_zero:
            keep_next = keep_next & (nxt != 0)
        prev_valid = (
            jnp.zeros(s, jnp.bool_).at[nxt].max(keep_next)
        )

    return CODSample(
        anchor_pos=jnp.concatenate(anchors),
        depth=jnp.concatenate(depths),
        valid=jnp.concatenate(valids),
    )


def peagle_allow_mask(sample: CODSample, doc_ids: jnp.ndarray) -> jnp.ndarray:
    """[T, T] COD attention predicate (reference peagle_mask_mod).

    Delegates to :func:`specforge_tpu.ops.peagle_pallas.cod_allow_dense` —
    the single XLA-side source of the predicate the Pallas kernel mirrors
    in-kernel (a drift between the two would silently skip real tiles)."""
    from specforge_tpu.ops.peagle_pallas import cod_allow_dense

    return cod_allow_dense(
        sample.anchor_pos,
        sample.depth,
        jnp.take(doc_ids, sample.anchor_pos),
        sample.valid.astype(jnp.int32),
    )


class OnlinePEagleModel(nn.Module):
    draft_model: PEagleDraftModel
    mask_token_id: int
    num_depths: int = 8
    down_sample_ratio: float = 0.7
    down_sample_ratio_min: float = 0.2

    def __call__(
        self,
        input_ids: jnp.ndarray,       # [B, S]
        attention_mask: jnp.ndarray,  # [B, S]
        target: jnp.ndarray,          # [B, S, V] teacher logits
        loss_mask: jnp.ndarray,       # [B, S] or [B, S, 1]
        hidden_states: jnp.ndarray,   # [B, S, 3*target_hidden]
        rng: jax.Array,
        lengths: Optional[jnp.ndarray] = None,
        embed_delta: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        b, s = input_ids.shape
        if loss_mask.ndim == 3:
            loss_mask = loss_mask[..., 0]
        if lengths is None:
            # offline path: one document of the true length per row
            lengths = attention_mask.sum(axis=-1).astype(jnp.int32)[:, None]
        lengths = lengths.reshape(b, -1).astype(jnp.int32)
        doc_ids = jax.vmap(
            document_ids_from_lengths, in_axes=(0, None)
        )(lengths, s)                                          # [B, S]

        # per-row keyed sampling; the sampler and mask builder are pure
        # per-sample functions, vmapped over the batch
        rngs = jax.random.split(rng, b)
        sample = jax.vmap(
            lambda r, lm, di: generate_cod_sample_indices(
                r, lm, di, self.num_depths, self.down_sample_ratio,
                self.down_sample_ratio_min,
            )
        )(rngs, loss_mask, doc_ids)                            # fields [B, T]
        # doc-major layout: cluster each document's sampled entries and push
        # invalid slots to the tail. Packed rows then present a
        # block-diagonal [T, T] predicate — cross-document tiles are FULLY
        # masked, so the Pallas kernel's any-table skips them wholesale
        # (depth-major interleaving leaves partial tiles at every document
        # boundary in every depth segment). The loss, metrics, and predicate
        # are permutation-invariant, so single-document behavior is
        # unchanged up to entry order.
        orig0 = sample.anchor_pos + sample.depth
        qdoc0 = jnp.take_along_axis(doc_ids, orig0, axis=1)
        # key packs (invalid, doc, depth, position) into int32: positions
        # < 2^14, depths < 2^5, docs+1 < 2^7 — bounds far above any COD run
        sort_key = (
            (1 - sample.valid.astype(jnp.int32)) * (1 << 27)
            + (qdoc0 + 1) * (1 << 19)
            + sample.depth * (1 << 14)
            + orig0
        )
        perm = jnp.argsort(sort_key, axis=1)
        sample = CODSample(
            anchor_pos=jnp.take_along_axis(sample.anchor_pos, perm, axis=1),
            depth=jnp.take_along_axis(sample.depth, perm, axis=1),
            valid=jnp.take_along_axis(sample.valid, perm, axis=1),
        )
        orig_positions = sample.anchor_pos + sample.depth      # [B, T]
        is_depth0 = sample.depth == 0

        # sampled token ids: real token at depth 0, mask token elsewhere
        sampled_ids = jnp.where(
            is_depth0,
            jnp.take_along_axis(input_ids, orig_positions, axis=1),
            self.mask_token_id,
        )
        inputs_embeds = self.draft_model.embed_input_ids(sampled_ids)
        if embed_delta is not None:
            # row-sparse embedding-update surrogate: zeros in the forward
            # (values unchanged); its cotangent IS the per-position
            # embedding-output gradient, so the dense [V, H] scatter grad
            # never materializes (training/train_step.py sparse path)
            inputs_embeds = inputs_embeds + embed_delta.astype(
                inputs_embeds.dtype
            )

        # sampled features: target hidden at depth 0, learned mask vector else
        mask_hidden = self.draft_model.get_mask_hidden()[0, 0]
        gathered_hidden = jnp.take_along_axis(
            hidden_states, orig_positions[..., None], axis=1
        )
        sampled_hidden = jnp.where(
            is_depth0[..., None],
            gathered_hidden,
            mask_hidden.astype(gathered_hidden.dtype)[None, None, :],
        )
        sampled_hidden = self.draft_model.project_hidden_states(sampled_hidden)

        allow = jax.vmap(peagle_allow_mask)(sample, doc_ids)   # [B, T, T]
        position_ids = orig_positions
        # COD property vectors let the Pallas backend compute the same mask
        # in-kernel (anchor doc-id indirection pre-applied)
        cod_props = (
            sample.anchor_pos,
            sample.depth,
            jnp.take_along_axis(doc_ids, sample.anchor_pos, axis=1),
            sample.valid,
        )
        h = self.draft_model.backbone(
            inputs_embeds, sampled_hidden, allow, position_ids,
            cod_props=cod_props,
        )
        logits = self.draft_model.compute_logits(h)

        t2d, d2t = self.draft_model.get_vocab_maps()
        loss, metrics = self._loss_and_metrics(
            logits, target, loss_mask, sample, orig_positions, t2d, d2t
        )
        # int row ids of the embedded tokens (for the sparse-update path);
        # the strategy strips this from the logged metrics
        metrics["embedded_ids"] = sampled_ids.reshape(-1)
        return loss, metrics

    def _loss_and_metrics(
        self, logits, target, loss_mask, sample, orig_positions, t2d, d2t
    ):
        sampled_loss_mask = jnp.take_along_axis(
            loss_mask, orig_positions, axis=1
        ).astype(jnp.float32) * sample.valid.astype(jnp.float32)  # [B, T]

        target32 = target.astype(jnp.float32)
        target_top1 = jnp.argmax(target32, axis=-1)               # [B, S]
        in_draft = jnp.take(
            t2d, jnp.take_along_axis(target_top1, orig_positions, axis=1)
        )
        sampled_loss_mask = sampled_loss_mask * in_draft.astype(jnp.float32)

        gather_idx = draft_gather_indices(d2t)
        # gather draft-vocab COLUMNS before expanding rows to the sampled
        # positions: the reverse order materializes a [T_sampled, V] fp32
        # intermediate (1.6 GB + a relayout copy ≈ 10 ms/step at the 152k
        # bench shape); this order peaks at [B, S, draft_V]
        target_logits = jnp.take_along_axis(
            jnp.take(target32, gather_idx, axis=-1),
            orig_positions[..., None], axis=1,
        )
        target_p = jax.lax.stop_gradient(
            jax.nn.softmax(target_logits, axis=-1)
        )
        position_mask = sampled_loss_mask[..., None]
        total_positions = position_mask.shape[0] * position_mask.shape[1]
        # one masked mean over the whole batch: supervised positions pool
        # across rows (sum of per-position losses / total supervised count),
        # so the batched loss equals the denominator-weighted mean of the
        # per-row bs1 losses — the bs1 contract generalized, not changed
        denominator = jnp.maximum(jnp.sum(sampled_loss_mask), 1e-6)
        loss = log_softmax_loss(logits, target_p, position_mask) * (
            total_positions / denominator
        )

        pred_ids = jnp.argmax(logits, axis=-1)
        target_ids = jnp.argmax(target_p, axis=-1)
        metrics: Dict[str, Any] = {
            "loss_sum": jax.lax.stop_gradient(loss),
            "loss_total": jnp.asarray(1.0, jnp.float32),
        }
        correct_total = jnp.asarray(0.0)
        count_total = jnp.asarray(0.0)
        supervised = sampled_loss_mask > 0.5
        for d in range(self.num_depths):
            depth_mask = (sample.depth == d) & supervised
            d_correct = jnp.sum(
                ((pred_ids == target_ids) & depth_mask).astype(jnp.float32)
            )
            d_total = jnp.sum(depth_mask.astype(jnp.float32))
            metrics[f"position_{d}_acc_sum"] = d_correct
            metrics[f"position_{d}_acc_total"] = d_total
            correct_total = correct_total + d_correct
            count_total = count_total + d_total
        metrics["full_acc_sum"] = correct_total
        metrics["full_acc_total"] = count_total
        return loss, metrics
