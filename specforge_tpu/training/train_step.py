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


class SparseEmbedPlan:
    """Row-sparse embedding update plan (see OptimizerConfig.row_sparse_embedding).

    ``path``: flat tuple path of the embedding table in the param tree.
    ``delta_shape_fn``: tensors → shape of the zeros surrogate whose
    cotangent is the per-position embedding-output gradient.
    ``opt_config`` / ``schedule``: optimizer hyperparams + LR schedule for
    the manual factored-Adam row update.
    """

    def __init__(self, path, delta_shape_fn, opt_config, schedule):
        self.path = tuple(path)
        self.delta_shape_fn = delta_shape_fn
        self.opt_config = opt_config
        self.schedule = schedule


def _pop_sparse_leaf(trainable, trainable_mask, path):
    """Flatten ``trainable`` if needed and remove the sparse-embed leaf."""
    if trainable_mask is None:
        trainable = traverse_util.flatten_dict(trainable)
    else:
        trainable = dict(trainable)
    if path not in trainable:
        raise ValueError(
            f"sparse-embed path {path} not found among trainable params"
        )
    leaf = trainable.pop(path)
    return trainable, leaf


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
        sparse_embed_path: Optional[Tuple[str, ...]] = None,
    ):
        trainable, _frozen = partition_params(params, trainable_mask)
        if sparse_embed_path is not None:
            from specforge_tpu.training.optimizer import (
                init_sparse_embed_state,
            )

            trainable, leaf = _pop_sparse_leaf(
                trainable, trainable_mask, tuple(sparse_embed_path)
            )
            opt_state = {
                "optax": tx.init(trainable),
                "sparse_embed": init_sparse_embed_state(leaf),
            }
        else:
            opt_state = tx.init(trainable)
        return cls(
            params=params,
            buffers=buffers,
            opt_state=opt_state,
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
    sparse_embed: Optional[SparseEmbedPlan] = None,
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
        if sparse_embed is not None:
            delta0 = jnp.zeros(
                sparse_embed.delta_shape_fn(tensors), jnp.float32
            )

        def loss_fn(tp, delta=None):
            p = merge_params(tp, frozen_params)
            if compute_params_dtype is not None:
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(compute_params_dtype)
                    if x.dtype == jnp.float32 else x,
                    p,
                )
                p = jax.lax.optimization_barrier(p)
            t = tensors if delta is None else {**tensors, "embed_delta": delta}
            out = strategy.forward_loss(
                {"params": p, "buffers": buffers}, t, frozen, ctx, metadata
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
            if sparse_embed is not None:
                ids = out.aux["embedded_ids"].reshape(-1).astype(jnp.int32)
                return grad_target, (stats, ids)
            return grad_target, stats

        if sparse_embed is not None:
            (_, (stats, ids)), (grads, d_delta) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(trainable, delta0)
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(grads_dtype), grads
            )
            d_delta = d_delta.reshape(-1, d_delta.shape[-1]).astype(
                jnp.float32
            )
            return grads, stats, ids, d_delta

        (_, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        grads = jax.tree_util.tree_map(lambda g: g.astype(grads_dtype), grads)
        return grads, stats

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], frozen):
        ctx = StepContext(global_step=state.step, total_steps=total_steps)
        trainable, frozen_params = partition_params(state.params, trainable_mask)
        if sparse_embed is not None:
            # the sparse-embed leaf is constant w.r.t. AD (its grads arrive
            # as per-token delta rows) and invisible to optax — park it with
            # the frozen params and update it manually below
            trainable, embed_table = _pop_sparse_leaf(
                trainable, trainable_mask, sparse_embed.path
            )
            frozen_params = dict(frozen_params)
            frozen_params[sparse_embed.path] = embed_table
        # First micro-step hoisted out of the scan (the _scan_chunks pattern,
        # ops/fused_objective.py:63): at accum_steps=1 the model then runs
        # with no while loop around it at all — XLA schedules/overlaps the
        # whole step freely — and at accum_steps>1 it saves the zeros-init +
        # tree-add pass over a full gradient pytree.
        micro0 = jax.tree_util.tree_map(lambda x: x[0], batch)
        out0 = micro(
            trainable, frozen_params, state.buffers, micro0, frozen, ctx
        )
        if sparse_embed is not None:
            grads, stats, ids_all, dd_all = out0
        else:
            grads, stats = out0
        if accum_steps > 1:

            def scan_body(carry, micro_batch):
                grads_acc, stats_acc = carry
                out = micro(
                    trainable, frozen_params, state.buffers, micro_batch,
                    frozen, ctx,
                )
                if sparse_embed is not None:
                    g, s, ids, dd = out
                    ys = (ids, dd)
                else:
                    g, s = out
                    ys = None
                carry = jax.tree_util.tree_map(
                    jnp.add, (grads_acc, stats_acc), (g, s)
                )
                return carry, ys

            rest = jax.tree_util.tree_map(lambda x: x[1:], batch)
            (grads, stats), ys = jax.lax.scan(scan_body, (grads, stats), rest)
            if sparse_embed is not None:
                ids_r, dd_r = ys
                ids_all = jnp.concatenate(
                    [ids_all, ids_r.reshape(-1)]
                )
                dd_all = jnp.concatenate(
                    [dd_all, dd_r.reshape(-1, dd_r.shape[-1])]
                )

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

        if sparse_embed is not None:
            from specforge_tpu.training.optimizer import (
                segment_sum_rows, sparse_embed_update,
            )

            uids, summed = segment_sum_rows(ids_all, dd_all / norm)
            # clip by the TOTAL global norm (optax leaves + embedding rows);
            # tx was built without its internal clip stage
            max_norm = sparse_embed.opt_config.max_grad_norm
            grad_norm = jnp.sqrt(
                optax.global_norm(grads) ** 2 + jnp.sum(summed * summed)
            )
            scale = jnp.where(
                grad_norm < max_norm, 1.0,
                max_norm / jnp.maximum(grad_norm, 1e-30),
            )
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            summed = summed * scale
            updates, optax_state = tx.update(
                grads, state.opt_state["optax"], trainable
            )
            new_trainable = optax.apply_updates(trainable, updates)
            new_table, sparse_state = sparse_embed_update(
                sparse_embed.opt_config, sparse_embed.schedule,
                state.opt_state["sparse_embed"],
                frozen_params[sparse_embed.path], uids, summed,
            )
            frozen_params[sparse_embed.path] = new_table
            opt_state = {"optax": optax_state, "sparse_embed": sparse_state}
        else:
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
