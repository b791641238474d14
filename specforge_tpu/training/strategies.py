"""Per-algorithm training strategies: TrainBatch tensors → loss + metrics.

A strategy is the only component that knows how a draft algorithm turns a
normalized batch into a differentiable loss; the train step stays branch-free.
Mirrors specforge/training/strategies/base.py:69-603 — ``forward_loss`` here is
a *pure traced function* called inside the jitted train step, so strategies
hold flax module definitions (static) and receive parameters explicitly.
"""

from __future__ import annotations

import abc
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from specforge_tpu.models.target.head import apply_target_head, target_head_preprocess


@dataclass
class StepOutput:
    """loss keeps grad; metrics are detached scalars; ratio_metrics are
    (numerator, denominator) pairs summed across the accumulation window and
    data-parallel ranks before dividing; loss_terms optionally carries an
    additive objective (numerator, denominator) for cross-window gradient
    normalization (the DFlash-family contract)."""

    loss: jnp.ndarray
    metrics: Dict[str, jnp.ndarray] = field(default_factory=dict)
    ratio_metrics: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = field(
        default_factory=dict
    )
    loss_terms: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
    #: non-logged passthrough arrays (any dtype) the train step may consume
    #: (e.g. the embedded-token row ids for the row-sparse embedding update)
    aux: Dict[str, jnp.ndarray] = field(default_factory=dict)


@dataclass(frozen=True)
class StepContext:
    global_step: Any = 0
    total_steps: Optional[int] = None


def linear_lambda_base(
    global_step, total_steps: int, lambda_start: float = 1.0,
    decay_ratio: float = 0.5,
):
    """Domino base-loss weight: linear decay to 0 over total_steps*decay_ratio."""
    decay_steps = max(1, int(total_steps * decay_ratio))
    progress = jnp.minimum(global_step / decay_steps, 1.0)
    return jnp.clip(lambda_start * (1.0 - progress), 0.0, 1.0)


class DraftTrainStrategy(abc.ABC):
    name: str
    required_features: set
    # True when forward_loss emits loss_terms (numerator, denominator) and the
    # train step must normalize gradients by the window-global denominator.
    uses_loss_terms: bool = False

    def validate_batch(self, tensors: Dict[str, Any]) -> None:
        missing = {f for f in self.required_features if f not in tensors}
        if missing:
            raise ValueError(
                f"{self.name} batch missing required features {sorted(missing)}; "
                f"present={sorted(tensors)}"
            )

    @abc.abstractmethod
    def forward_loss(
        self,
        variables: Dict[str, Any],
        tensors: Dict[str, jnp.ndarray],
        frozen: Dict[str, jnp.ndarray],
        ctx: StepContext,
        metadata: Optional[Dict[str, Any]] = None,
    ) -> StepOutput:
        """Traced: variables = {'params', 'buffers', ...}; frozen carries
        non-trainable tensors that must not be baked into the jaxpr (the
        target lm_head weight)."""

    def checkpoint_state_filter(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Select the draft-weight subtree this strategy persists/exports."""
        return params


class Eagle3TrainStrategy(DraftTrainStrategy):
    """EAGLE3 TTT strategy over :class:`OnlineEagle3Model`.

    ``target_repr``:
      - "hidden_state" (offline): re-run the frozen head over the stored last
        hidden state — or stream it in vocab chunks when ``compact_teacher``.
      - "logits"/None (online): use delivered teacher logits as-is.
    """

    name = "eagle3"
    required_features = {
        "input_ids", "attention_mask", "loss_mask", "hidden_state", "target",
    }

    def __init__(
        self,
        model,  # OnlineEagle3Model (flax module definition)
        *,
        ploss_decay: float = 0.8,
        compact_teacher: bool = False,
        compact_teacher_chunk_size: int = 32768,
        freeze_embedding: bool = True,
    ) -> None:
        self.model = model
        self.ploss_decay = ploss_decay
        self.compact_teacher = compact_teacher
        self.compact_teacher_chunk_size = compact_teacher_chunk_size
        self.freeze_embedding = freeze_embedding

    def forward_loss(self, variables, tensors, frozen, ctx, metadata=None):
        self.validate_batch(tensors)
        metadata = metadata or {}
        target_repr = metadata.get("target_repr")
        input_ids = tensors["input_ids"]
        target = tensors["target"]
        loss_mask = tensors["loss_mask"]
        model_kwargs: Dict[str, Any] = {}

        if target_repr == "hidden_state":
            head_w = frozen.get("target_head_weight")
            if head_w is None:
                raise ValueError(
                    "target_repr='hidden_state' requires frozen['target_head_weight']"
                )
            input_ids, target_hidden, loss_mask = target_head_preprocess(
                input_ids, target, loss_mask
            )
            if self.compact_teacher:
                target = None
                model_kwargs.update(
                    target_hidden_for_compact=target_hidden,
                    target_head_weight=head_w,
                    compact_teacher_chunk_size=self.compact_teacher_chunk_size,
                )
            else:
                target = apply_target_head(head_w, target_hidden)
        elif loss_mask.ndim == 2:
            loss_mask = loss_mask[..., None]

        out = self.model.apply(
            variables,
            input_ids,
            tensors["attention_mask"],
            loss_mask,
            tensors["hidden_state"],
            target,
            position_ids=tensors.get("position_ids"),
            **model_kwargs,
        )
        length = out.plosses.shape[0]
        weights = jnp.asarray(
            [self.ploss_decay ** i for i in range(length)], jnp.float32
        )
        loss = jnp.sum(weights * out.plosses)
        ratio_metrics = {}
        for i in range(length):
            ratio_metrics[f"acc_{i}"] = (
                out.metric_corrects[i], out.metric_denoms[i]
            )
            ratio_metrics[f"ploss_{i}"] = (
                out.metric_losses[i] * out.metric_loss_denoms[i],
                out.metric_loss_denoms[i],
            )
        metrics = {
            f"acceptance_rate_{i}": out.acceptance_rates[i]
            for i in range(length)
        }
        return StepOutput(loss=loss, metrics=metrics, ratio_metrics=ratio_metrics)

    def checkpoint_state_filter(self, params):
        draft = params.get("draft_model", params)
        if not self.freeze_embedding:
            return draft
        return {k: v for k, v in draft.items() if "embed" not in k.lower()}

    def eval_outputs(self, variables, tensors, frozen, metadata=None):
        """Batch-size-invariant eval sums: per-TTT-position numerators and
        denominators (divided only after reduction over the full eval set —
        reference eval/evaluator.py:27-222)."""
        metadata = metadata or {}
        target_repr = metadata.get("target_repr")
        input_ids = tensors["input_ids"]
        target = tensors["target"]
        loss_mask = tensors["loss_mask"]
        if target_repr == "hidden_state":
            head_w = frozen["target_head_weight"]
            input_ids, target_hidden, loss_mask = target_head_preprocess(
                input_ids, target, loss_mask
            )
            target = apply_target_head(head_w, target_hidden)
        elif loss_mask.ndim == 2:
            loss_mask = loss_mask[..., None]
        out = self.model.apply(
            variables,
            input_ids,
            tensors["attention_mask"],
            loss_mask,
            tensors["hidden_state"],
            target,
            position_ids=tensors.get("position_ids"),
        )
        return {
            "corrects": out.metric_corrects,
            "denoms": out.metric_denoms,
            "acc_nums": out.acceptance_nums,
            "acc_dens": out.acceptance_denoms,
            "loss_sums": out.metric_losses * out.metric_loss_denoms,
            "loss_dens": out.metric_loss_denoms,
        }


class DFlashTrainStrategy(DraftTrainStrategy):
    """DFlash block-parallel strategy over :class:`OnlineDFlashModel`.

    Anchor sampling is keyed on (seed, global_step) so colocated and
    disaggregated topologies (and resumes) reproduce identical anchors — the
    parity-gate determinism contract.
    """

    name = "dflash"
    required_features = {"input_ids", "hidden_states", "loss_mask"}
    uses_loss_terms = True

    def __init__(self, model, *, seed: int = 0) -> None:
        self.model = model
        self.seed = seed

    def _rng(self, ctx: Optional[StepContext]):
        step = ctx.global_step if ctx is not None else 0
        return jax.random.fold_in(jax.random.PRNGKey(self.seed), step)

    def forward_loss(self, variables, tensors, frozen, ctx, metadata=None):
        self.validate_batch(tensors)
        loss, accuracy, model_metrics = self.model.apply(
            variables,
            tensors["input_ids"],
            tensors["hidden_states"],
            tensors["loss_mask"],
            frozen["target_head_weight"],
            frozen["target_embed_weight"],
            self._rng(ctx),
        )
        return StepOutput(
            loss=loss,
            metrics={"accuracy": jax.lax.stop_gradient(accuracy)},
            ratio_metrics=model_metrics.get("ratio_metrics", {}),
            loss_terms=model_metrics.get("loss_terms"),
        )

    def checkpoint_state_filter(self, params):
        return params.get("draft_model", params)


class DominoTrainStrategy(DFlashTrainStrategy):
    """Domino strategy: DFlash spine + decaying base-loss blend (lambda_base
    read from the training schedule via StepContext)."""

    name = "domino"
    required_features = {"input_ids", "hidden_states", "loss_mask"}
    uses_loss_terms = False

    def __init__(self, model, *, seed: int = 0, lambda_start: float = 1.0,
                 decay_ratio: float = 0.5) -> None:
        super().__init__(model, seed=seed)
        self.lambda_start = lambda_start
        self.decay_ratio = decay_ratio

    def _lambda_base(self, ctx: Optional[StepContext]):
        if ctx is None or not ctx.total_steps:
            return jnp.asarray(0.0, jnp.float32)
        return linear_lambda_base(
            ctx.global_step, ctx.total_steps, self.lambda_start,
            self.decay_ratio,
        )

    def forward_loss(self, variables, tensors, frozen, ctx, metadata=None):
        self.validate_batch(tensors)
        loss, accuracy, model_metrics = self.model.apply(
            variables,
            tensors["input_ids"],
            tensors["hidden_states"],
            tensors["loss_mask"],
            frozen["target_head_weight"],
            frozen["target_embed_weight"],
            self._rng(ctx),
            self._lambda_base(ctx),
        )
        metrics = {
            k: jax.lax.stop_gradient(v)
            for k, v in model_metrics.items()
            if k not in ("ratio_metrics", "loss_terms")
        }
        metrics["accuracy"] = jax.lax.stop_gradient(accuracy)
        return StepOutput(loss=loss, metrics=metrics)


class DSparkTrainStrategy(DFlashTrainStrategy):
    """DSpark strategy: DFlash spine + target-hidden supervision."""

    name = "dspark"
    required_features = {
        "input_ids", "hidden_states", "loss_mask", "target_last_hidden_states",
    }
    uses_loss_terms = False

    def forward_loss(self, variables, tensors, frozen, ctx, metadata=None):
        self.validate_batch(tensors)
        loss, accuracy, model_metrics = self.model.apply(
            variables,
            tensors["input_ids"],
            tensors["hidden_states"],
            tensors["loss_mask"],
            frozen["target_head_weight"],
            frozen["target_embed_weight"],
            self._rng(ctx),
            tensors["target_last_hidden_states"],
        )
        return StepOutput(
            loss=loss,
            metrics={"accuracy": jax.lax.stop_gradient(accuracy)},
            ratio_metrics=model_metrics.get("ratio_metrics", {}),
        )


class PEagleTrainStrategy(DraftTrainStrategy):
    """P-EAGLE COD strategy over :class:`OnlinePEagleModel`.

    Consumes the same capture as EAGLE3 (``hidden_state`` + ``target``); COD
    sampling is keyed on (seed, global_step). Unlike EAGLE3, embeddings and
    ``mask_hidden`` train, so the full draft subtree persists.
    """

    name = "peagle"
    required_features = {
        "input_ids", "attention_mask", "loss_mask", "hidden_state", "target",
    }
    #: COD consumes per-document ``lengths`` — packed rows are supported
    #: (data/collator.py PackingCollator; data.pack_documents)
    supports_packed_documents = True

    def __init__(self, model, *, seed: int = 0) -> None:
        self.model = model
        self.seed = seed

    #: path of the trainable embedding table inside the TrainState params
    sparse_embed_path = ("draft_model", "embed_tokens", "embedding")

    def sparse_embed_delta_shape(self, tensors):
        """[B, T_sampled, H] zeros-surrogate shape for the row-sparse
        embedding update (T is static given the COD sampler config)."""
        from specforge_tpu.models.draft.peagle import cod_capacities

        b, s = tensors["input_ids"].shape[:2]
        t = sum(cod_capacities(
            s, self.model.num_depths, self.model.down_sample_ratio,
            self.model.down_sample_ratio_min,
        ))
        return (b, t, self.model.draft_model.config.hidden_size)

    def forward_loss(self, variables, tensors, frozen, ctx, metadata=None):
        self.validate_batch(tensors)
        metadata = metadata or {}
        input_ids = tensors["input_ids"]
        target = tensors["target"]
        loss_mask = tensors["loss_mask"]
        if metadata.get("target_repr") == "hidden_state":
            head_w = frozen["target_head_weight"]
            input_ids, target_hidden, loss_mask = target_head_preprocess(
                input_ids, target, loss_mask
            )
            target = apply_target_head(head_w, target_hidden)
        step = ctx.global_step if ctx is not None else 0
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), step)
        lengths = tensors.get("lengths")
        if lengths is None:
            lengths = tensors["attention_mask"].sum(axis=-1)
        loss, model_metrics = self.model.apply(
            variables,
            input_ids,
            tensors["attention_mask"],
            target,
            loss_mask,
            tensors["hidden_state"],
            rng,
            lengths,
            embed_delta=tensors.get("embed_delta"),
        )
        metrics = {
            k: jax.lax.stop_gradient(v) for k, v in model_metrics.items()
            if k.endswith(("_sum", "_total"))
        }
        ratio_metrics = {
            "accuracy": (
                model_metrics["full_acc_sum"], model_metrics["full_acc_total"]
            ),
        }
        aux = {
            "embedded_ids": jax.lax.stop_gradient(
                model_metrics["embedded_ids"]
            )
        }
        return StepOutput(
            loss=loss.reshape(()), metrics=metrics,
            ratio_metrics=ratio_metrics, aux=aux,
        )

    def checkpoint_state_filter(self, params):
        # P-EAGLE trains its embeddings and mask_hidden: persist everything.
        return params.get("draft_model", params)
