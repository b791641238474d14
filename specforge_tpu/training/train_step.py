"""The jitted train step: branch-free micro-step accumulation + optimizer update.

TPU-native translation of TrainerCore (specforge/training/controller.py:307-479):

- FSDP ``no_sync``/boundary machinery disappears — gradients accumulate in a
  ``lax.scan`` over the micro-batch axis inside one compiled step, and XLA
  issues exactly one reduce-scatter per parameter at the end.
- The ``loss_terms`` contract (global gradient normalization by the summed
  objective denominator across the whole optimizer window and all ranks,
  controller.py:375-395) is a division after the scan; denominators computed
  from dp-sharded batches are already global sums under jit partitioning.
- Ratio metrics accumulate as (numerator, denominator) pairs and divide once.

Batch layout: every tensor carries a leading micro-step axis
``[accum, per_micro_batch, ...]`` (use ``accum=1`` for single-micro steps).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util

from specforge_tpu.training.strategies import DraftTrainStrategy, StepContext


def partition_params(params: Any, trainable_mask: Optional[Any]):
    """Split params into (trainable, frozen) by a boolean mask tree.

    Frozen leaves get no gradient buffer and no optimizer state — the TPU
    equivalent of the reference backend ignoring frozen target tables from
    sharding/optimizer (backend.py:179-197).
    """
    if trainable_mask is None:
        return params, {}
    flat_p = traverse_util.flatten_dict(params)
    flat_m = traverse_util.flatten_dict(trainable_mask)
    train = {k: v for k, v in flat_p.items() if flat_m[k]}
    frozen = {k: v for k, v in flat_p.items() if not flat_m[k]}
    return train, frozen


def merge_params(trainable: Any, frozen: Any, like: Optional[Any] = None):
    if not frozen:
        return trainable
    if not isinstance(next(iter(trainable.keys()), ()), tuple):
        trainable = traverse_util.flatten_dict(trainable)
    return traverse_util.unflatten_dict({**trainable, **frozen})


@struct.dataclass
class TrainState:
    params: Any
    buffers: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar = optimizer steps taken

    @classmethod
    def create(
        cls,
        params,
        buffers,
        tx: optax.GradientTransformation,
        trainable_mask: Optional[Any] = None,
    ):
        trainable, _frozen = partition_params(params, trainable_mask)
        return cls(
            params=params,
            buffers=buffers,
            opt_state=tx.init(trainable),
            step=jnp.zeros((), jnp.int32),
        )


def make_train_step(
    strategy: DraftTrainStrategy,
    tx: optax.GradientTransformation,
    *,
    accum_steps: int = 1,
    total_steps: Optional[int] = None,
    metadata: Optional[Dict[str, Any]] = None,
    lr_schedule: Optional[Callable] = None,
    trainable_mask: Optional[Any] = None,
    grads_dtype: Any = jnp.float32,
    compute_params_dtype: Optional[Any] = None,
    jit: bool = True,
) -> Callable:
    """Build ``train_step(state, batch, frozen) -> (state, metrics)``.

    ``frozen``: dict of non-trainable device arrays (e.g. the target lm_head
    weight) passed as explicit arguments so they are never baked into the
    compiled program as constants.

    ``grads_dtype``: storage dtype of the gradients between the backward
    pass and the optimizer (accumulation across micro-steps happens in this
    dtype too). ``bfloat16`` halves gradient HBM — the reference's FSDP
    bf16 mixed precision produces/accumulates bf16 grads and the
    BF16Optimizer copies them into fp32 masters
    (specforge/training/backend.py bf16 param mp + optimizer.py:12); the
    clip/Adam math here always runs fp32 at the boundary either way.

    ``compute_params_dtype``: when set (e.g. ``bfloat16``), fp32 master
    params are cast to this dtype ONCE per micro-step behind an
    ``optimization_barrier`` before the model sees them. Without it the
    flax modules' per-use-site casts fuse INTO each matmul as a weight-side
    producer, so the MXU waits on the VPU converting the fp32 kernel tile
    by tile — on v5e this runs the worst DFlash MLP matmuls at 54-63% of
    peak while identical matmuls with materialized bf16 weights hit 87%.
    The barrier materializes one bf16 copy (read by fwd and dgrad; ~half
    the HBM traffic of two fused fp32 reads) at the cost of params-sized
    bf16 live memory. Numerics are unchanged: the per-use-site casts
    perform the same rounding, only earlier — but weight-grads are then
    produced in the compute dtype before the fp32 convert-back, i.e. the
    effective wgrad precision matches ``grads_dtype=bfloat16`` (the
    reference's FSDP bf16 mixed precision, backend.py).
    """
    metadata = dict(metadata or {})
    grads_dtype = jnp.dtype(grads_dtype)
    compute_params_dtype = (
        jnp.dtype(compute_params_dtype)
        if compute_params_dtype is not None else None
    )

    def micro(trainable, frozen_params, buffers, tensors, frozen, ctx):
        def loss_fn(tp):
            p = merge_params(tp, frozen_params)
            if compute_params_dtype is not None:
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(compute_params_dtype)
                    if x.dtype == jnp.float32 else x,
                    p,
                )
                p = jax.lax.optimization_barrier(p)
            out = strategy.forward_loss(
                {"params": p, "buffers": buffers}, tensors, frozen, ctx, metadata
            )
            if out.loss_terms is None:
                grad_target = out.loss
                denom = jnp.asarray(1.0, jnp.float32)
                loss_display = out.loss.astype(jnp.float32)
            else:
                grad_target = out.loss_terms[0]
                denom = out.loss_terms[1].astype(jnp.float32)
                loss_display = out.loss_terms[0].astype(jnp.float32)
            # aux must be a pytree (dict/tuple), not the StepOutput dataclass
            stats = {
                "loss": loss_display,
                "metrics": {
                    k: v.astype(jnp.float32) for k, v in out.metrics.items()
                },
                "ratio_num": {
                    k: v[0].astype(jnp.float32)
                    for k, v in out.ratio_metrics.items()
                },
                "ratio_den": {
                    k: v[1].astype(jnp.float32)
                    for k, v in out.ratio_metrics.items()
                },
                "denom": denom,
            }
            return grad_target, stats

        (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        grads = jax.tree_util.tree_map(lambda g: g.astype(grads_dtype), grads)
        return grads, stats

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], frozen):
        ctx = StepContext(global_step=state.step, total_steps=total_steps)
        trainable, frozen_params = partition_params(state.params, trainable_mask)
        # First micro-step hoisted out of the scan (the _scan_chunks pattern,
        # ops/fused_objective.py:63): at accum_steps=1 the model then runs
        # with no while loop around it at all — XLA schedules/overlaps the
        # whole step freely — and at accum_steps>1 it saves the zeros-init +
        # tree-add pass over a full gradient pytree.
        micro0 = jax.tree_util.tree_map(lambda x: x[0], batch)
        grads, stats = micro(
            trainable, frozen_params, state.buffers, micro0, frozen, ctx
        )
        if accum_steps > 1:

            def scan_body(carry, micro_batch):
                grads_acc, stats_acc = carry
                g, s = micro(
                    trainable, frozen_params, state.buffers, micro_batch,
                    frozen, ctx,
                )
                carry = jax.tree_util.tree_map(
                    jnp.add, (grads_acc, stats_acc), (g, s)
                )
                return carry, None

            rest = jax.tree_util.tree_map(lambda x: x[1:], batch)
            (grads, stats), _ = jax.lax.scan(scan_body, (grads, stats), rest)

        # Static decision: strategies declare the loss_terms contract.
        uses_loss_terms = getattr(strategy, "uses_loss_terms", False)

        if uses_loss_terms:
            norm = jnp.maximum(stats["denom"], 1e-6)
            loss_out = stats["loss"] / norm
        else:
            norm = jnp.asarray(float(accum_steps), jnp.float32)
            loss_out = stats["loss"] / norm
        # optimizer math is fp32 regardless of the grad storage dtype
        grads = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32) / norm, grads
        )

        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        params = merge_params(new_trainable, frozen_params)
        new_state = state.replace(
            params=params, opt_state=opt_state, step=state.step + 1
        )

        metrics = {"train/loss": loss_out, "train/grad_norm": grad_norm}
        for k, v in stats["metrics"].items():
            metrics[f"train/{k}"] = v / accum_steps
        for k in stats["ratio_num"]:
            metrics[f"train/{k}"] = stats["ratio_num"][k] / jnp.maximum(
                stats["ratio_den"][k], 1e-6
            )
        if lr_schedule is not None:
            metrics["train/lr"] = lr_schedule(state.step)
        return new_state, metrics

    if jit:
        return jax.jit(train_step, donate_argnums=(0,))
    return train_step
