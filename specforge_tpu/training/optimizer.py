"""Optimizer + LR schedules.

Numerically mirrors the reference BF16Optimizer (specforge/optimizer.py:12-232):
AdamW over fp32 master parameters with global-norm clipping and linear-warmup →
{cosine annealing | constant} schedules (specforge/lr_scheduler.py:7-150).

The TPU-native shape: parameters *are* the fp32 masters (compute casts to bf16
at use sites inside the model), so "grad copy → master step → master copy-back"
collapses into a plain optax update; the cross-rank grad-norm all-reduce is
implicit because grads live sharded on the mesh and ``global_norm`` contracts
over the full (logical) tensors.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 1e-4
    weight_decay: float = 0.0
    max_grad_norm: float = 0.5
    warmup_ratio: float = 0.015
    lr_scheduler: str = "cosine"  # cosine | constant
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    #: dtype of the Adam first/second moments. fp32 masters are kept either
    #: way; "bfloat16" halves optimizer-state HBM — the single-chip answer to
    #: the reference BF16Optimizer's CPU offload (specforge/optimizer.py:12;
    #: multi-chip runs shard the fp32 state over fsdp instead).
    moments_dtype: str = "float32"
    #: Adafactor-style rank-1 second moments for large matrices: a leaf with
    #: ndim>=2 and both trailing dims >= ``factored_min_dim`` stores row/col
    #: EMA vectors instead of a dense ``nu`` (O(r+c) vs O(r*c) HBM). Adam
    #: semantics otherwise (b1/b2/eps, bias correction). With ``adam_b1=0``
    #: the first moment is dropped too — optimizer state for a 152k-vocab
    #: P-EAGLE draft goes from ~12 GB to ~0, the difference between needing
    #: two chips and training on one.
    factored_second_moments: bool = False
    factored_min_dim: int = 128


def build_lr_schedule(config: OptimizerConfig, total_steps: int) -> Callable:
    """Linear warmup over ``warmup_ratio * total_steps`` then cosine/constant.

    Warmup matches the reference ``(step + 1) / warmup_steps`` ramp; cosine
    anneals to 0 over the remaining steps.
    """
    warmup_steps = int(config.warmup_ratio * total_steps)
    base_lr = config.lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            warm = jnp.minimum((step + 1.0) / warmup_steps, 1.0) * base_lr
        else:
            warm = jnp.asarray(base_lr, jnp.float32)
        if config.lr_scheduler == "constant":
            after = base_lr
        else:
            t = jnp.clip(
                (step - warmup_steps) / max(total_steps - warmup_steps, 1),
                0.0,
                1.0,
            )
            after = base_lr * 0.5 * (1.0 + jnp.cos(math.pi * t))
        return jnp.where(step < warmup_steps, warm, after)

    if config.lr_scheduler not in ("cosine", "constant"):
        raise ValueError(f"unsupported lr_scheduler={config.lr_scheduler!r}")
    return schedule


def _scale_by_adam_lowp_moments(
    b1: float, b2: float, eps: float, dtype
) -> optax.GradientTransformation:
    """scale_by_adam with BOTH moments stored in ``dtype`` (optax only
    supports mu_dtype); accumulation happens in fp32 each step."""

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(grads, state, params=None):
        del params
        f32 = jnp.float32
        mu = jax.tree_util.tree_map(
            lambda m, g: (b1 * m.astype(f32) + (1 - b1) * g).astype(dtype),
            state.mu, grads,
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: (b2 * v.astype(f32) + (1 - b2) * g * g).astype(dtype),
            state.nu, grads,
        )
        count = state.count + 1
        c = count.astype(f32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        updates = jax.tree_util.tree_map(
            lambda m, v: (m.astype(f32) / bc1)
            / (jnp.sqrt(v.astype(f32) / bc2) + eps),
            mu, nu,
        )
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


class FactoredAdamState(NamedTuple):
    """Per-leaf moments; unused variants hold shape-(1,) placeholders so the
    state pytrees mirror the param tree (per-leaf fsdp sharding + orbax
    restore both key off leaf shapes)."""

    count: jnp.ndarray
    mu: Any        # first moment (placeholder when b1 == 0)
    nu: Any        # dense second moment (placeholder when factored)
    nu_row: Any    # factored row EMA of g^2 over the last axis
    nu_col: Any    # factored col EMA of g^2 over the second-to-last axis


def _scale_by_factored_adam(
    b1: float, b2: float, eps: float, dtype, min_dim: int
) -> optax.GradientTransformation:
    """Adam whose second moment is rank-1-factored for large matrices
    (Adafactor's nu factorization inside Adam: nu_hat = R C^T / sum(R)),
    with optional momentum-free operation when ``b1 == 0``.

    Unlike ``optax.adafactor`` this keeps Adam's update semantics —
    bias-corrected moments, absolute LR, ``sqrt(nu_hat) + eps`` — so it is
    a drop-in for the reference AdamW numerics with O(r+c) state.

    The factored row/col vectors always live in fp32 regardless of
    ``dtype``: they are O(r+c) (KBs even at vocab scale) so low precision
    saves nothing, and bf16 would freeze the EMA once ``(1-b2)``-sized
    increments fall under the bf16 ulp. ``dtype`` still applies to ``mu``
    and to the dense ``nu`` of non-factored leaves, where it buys real HBM.
    """
    placeholder = lambda: jnp.zeros((1,), dtype)  # noqa: E731
    f32 = jnp.float32

    def is_factored(p) -> bool:
        return p.ndim >= 2 and min(p.shape[-2:]) >= min_dim

    def init(params):
        tmap = jax.tree_util.tree_map
        mu = tmap(
            lambda p: jnp.zeros_like(p, dtype=dtype) if b1 > 0.0
            else placeholder(),
            params,
        )
        nu = tmap(
            lambda p: placeholder() if is_factored(p)
            else jnp.zeros_like(p, dtype=dtype),
            params,
        )
        nu_row = tmap(
            lambda p: jnp.zeros(p.shape[:-1], f32) if is_factored(p)
            else placeholder(),
            params,
        )
        nu_col = tmap(
            lambda p: jnp.zeros(p.shape[:-2] + p.shape[-1:], f32)
            if is_factored(p) else placeholder(),
            params,
        )
        return FactoredAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=mu, nu=nu, nu_row=nu_row, nu_col=nu_col,
        )

    def update(grads, state, params=None):
        del params
        f32 = jnp.float32
        count = state.count + 1
        c = count.astype(f32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        tmap = jax.tree_util.tree_map

        if b1 > 0.0:
            mu = tmap(
                lambda m, g: (b1 * m.astype(f32) + (1 - b1) * g).astype(
                    dtype
                ),
                state.mu, grads,
            )
        else:
            mu = state.mu

        def new_nu(v, g):
            if is_factored(g):
                return v
            return (b2 * v.astype(f32) + (1 - b2) * g * g).astype(dtype)

        def new_row(r, g):
            if not is_factored(g):
                return r
            gg = (g * g).astype(f32)
            return b2 * r + (1 - b2) * gg.sum(axis=-1)  # fp32 state

        def new_col(cv, g):
            if not is_factored(g):
                return cv
            gg = (g * g).astype(f32)
            return b2 * cv + (1 - b2) * gg.sum(axis=-2)  # fp32 state

        nu = tmap(new_nu, state.nu, grads)
        nu_row = tmap(new_row, state.nu_row, grads)
        nu_col = tmap(new_col, state.nu_col, grads)

        def upd(g, m, v, r, cv):
            mhat = (m.astype(f32) / bc1) if b1 > 0.0 else g
            if is_factored(g):
                r32 = r.astype(f32)
                c32 = cv.astype(f32)
                denom = jnp.maximum(
                    r32.sum(axis=-1, keepdims=True)[..., None], 1e-30
                )
                vhat = (r32[..., :, None] * c32[..., None, :]) / denom
            else:
                vhat = v.astype(f32)
            return mhat / (jnp.sqrt(vhat / bc2) + eps)

        updates = tmap(upd, grads, mu, nu, nu_row, nu_col)
        return updates, FactoredAdamState(
            count=count, mu=mu, nu=nu, nu_row=nu_row, nu_col=nu_col
        )

    return optax.GradientTransformation(init, update)


def build_optimizer(
    config: OptimizerConfig,
    total_steps: int,
    trainable_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Clip-by-global-norm → AdamW with the warmup schedule.

    ``trainable_mask``: pytree of bools matching params; False leaves (frozen,
    e.g. the target-copied embedding) receive zero updates and no optimizer
    state.
    """
    schedule = build_lr_schedule(config, total_steps)
    if config.factored_second_moments:
        adamw = optax.chain(
            _scale_by_factored_adam(
                config.adam_b1, config.adam_b2, config.adam_eps,
                jnp.dtype(config.moments_dtype), config.factored_min_dim,
            ),
            optax.add_decayed_weights(config.weight_decay),
            optax.scale_by_learning_rate(schedule),
        )
    elif config.moments_dtype == "float32":
        adamw = optax.adamw(
            learning_rate=schedule,
            b1=config.adam_b1,
            b2=config.adam_b2,
            eps=config.adam_eps,
            weight_decay=config.weight_decay,
        )
    else:
        adamw = optax.chain(
            _scale_by_adam_lowp_moments(
                config.adam_b1, config.adam_b2, config.adam_eps,
                jnp.dtype(config.moments_dtype),
            ),
            optax.add_decayed_weights(config.weight_decay),
            optax.scale_by_learning_rate(schedule),
        )
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        adamw,
    )
    if trainable_mask is not None:
        labels = jax.tree_util.tree_map(
            lambda trainable: "trainable" if trainable else "frozen",
            trainable_mask,
        )
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, labels
        )
    return tx


def cast_frozen_to(params: Any, trainable_mask: Any, dtype) -> Any:
    """Cast frozen (mask=False) floating leaves to ``dtype`` — frozen tables
    need no fp32 master copy (they are never updated), halving their HBM."""
    def _cast(leaf, trainable):
        if not trainable and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(_cast, params, trainable_mask)


def embedding_freeze_mask(params: Any, freeze_embedding: bool = True) -> Any:
    """True = trainable. Freezes any leaf whose path contains 'embed'
    (the EAGLE3 target-copied embedding contract; P-EAGLE passes False)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_has_embed(path) -> bool:
        return any("embed" in str(getattr(k, "key", k)).lower() for k in path)

    def mask_leaf(path, _leaf):
        return not (freeze_embedding and path_has_embed(path))

    treedef = jax.tree_util.tree_structure(params)
    leaves = [mask_leaf(path, leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)
