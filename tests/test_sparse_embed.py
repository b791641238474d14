"""Row-sparse embedding update: bit-level equivalence with the dense path.

Under the required regime (factored second moments, adam_b1=0, wd=0) the
dense factored-Adam update of an embedding table moves ONLY rows with
nonzero gradient, so the sparse scatter path must reproduce the dense run
exactly (same clip scale, same moments, same masters).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from specforge_tpu.algorithms.builtin import builtin_algorithm_registry
from specforge_tpu.training.optimizer import (
    OptimizerConfig,
    build_lr_schedule,
    build_optimizer,
    segment_sum_rows,
)
from specforge_tpu.training.train_step import (
    SparseEmbedPlan,
    TrainState,
    make_train_step,
)

V, H, S = 96, 32, 48

OPTS = {
    "num_depths": 3,
    "down_sample_ratio": 0.6,
    "down_sample_ratio_min": 0.3,
    "seed": 0,
}

DRAFT_CONFIG = {
    "architectures": ["PEagleDraftModel"],
    "vocab_size": V,
    "draft_vocab_size": 48,
    "hidden_size": H,
    "intermediate_size": 64,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "head_dim": 8,
    "num_hidden_layers": 2,
    "max_position_embeddings": 256,
}


def _build(sparse: bool):
    reg = builtin_algorithm_registry().resolve("peagle")
    p = reg.providers
    draft, cfg = p.build_draft(DRAFT_CONFIG, dtype=jnp.float32)
    model = p.build_training_model(draft, OPTS)
    strategy = p.build_strategy(model, OPTS)
    opt_cfg = OptimizerConfig(
        lr=1e-2,
        max_grad_norm=0.5,
        factored_second_moments=True,
        factored_min_dim=8,
        adam_b1=0.0,
        weight_decay=0.0,
        row_sparse_embedding=sparse,
    )
    total_steps = 20
    tx = build_optimizer(opt_cfg, total_steps, include_clip=not sparse)
    variables = p.init_variables(model, cfg, OPTS, jax.random.PRNGKey(0), S)
    plan = None
    if sparse:
        plan = SparseEmbedPlan(
            strategy.sparse_embed_path,
            strategy.sparse_embed_delta_shape,
            opt_cfg,
            build_lr_schedule(opt_cfg, total_steps),
        )
    state = TrainState.create(
        variables["params"], variables.get("buffers", {}), tx,
        sparse_embed_path=plan.path if plan else None,
    )
    step_fn = make_train_step(
        strategy, tx, accum_steps=1, total_steps=total_steps,
        metadata={"target_repr": "hidden_state"}, sparse_embed=plan,
    )
    return state, step_fn, cfg


def _batch(cfg, rng):
    return {
        "input_ids": jnp.asarray(rng.integers(0, V, size=(1, 1, S))),
        "attention_mask": jnp.ones((1, 1, S), jnp.int32),
        "loss_mask": jnp.asarray(
            (rng.random((1, 1, S, 1)) > 0.2).astype(np.int32)
        ),
        "hidden_state": jnp.asarray(
            rng.normal(size=(1, 1, S, 3 * cfg.hidden_size))
        ).astype(jnp.float32),
        "target": jnp.asarray(
            rng.normal(size=(1, 1, S, cfg.hidden_size))
        ).astype(jnp.float32),
    }


def test_sparse_matches_dense_exactly():
    rng = np.random.default_rng(0)
    head_w = jnp.asarray(rng.normal(size=(V, H)) * 0.1, jnp.float32)
    frozen = {"target_head_weight": head_w}

    state_d, step_d, cfg = _build(sparse=False)
    state_s, step_s, _ = _build(sparse=True)

    losses = {}
    for name, (state, fn) in {
        "dense": (state_d, step_d), "sparse": (state_s, step_s)
    }.items():
        data_rng = np.random.default_rng(7)
        run = []
        for _ in range(5):
            batch = _batch(cfg, data_rng)
            state, metrics = fn(state, batch, dict(frozen))
            run.append(float(metrics["train/loss"]))
        losses[name] = run
        if name == "dense":
            final_d = state
        else:
            final_s = state

    np.testing.assert_allclose(losses["sparse"], losses["dense"], rtol=1e-5)

    flat_d = jax.tree_util.tree_leaves_with_path(final_d.params)
    flat_s = dict(
        (jax.tree_util.keystr(kp), v)
        for kp, v in jax.tree_util.tree_leaves_with_path(final_s.params)
    )
    for kp, vd in flat_d:
        vs = flat_s[jax.tree_util.keystr(kp)]
        np.testing.assert_allclose(
            np.asarray(vs), np.asarray(vd), rtol=2e-5, atol=1e-7,
            err_msg=f"param {jax.tree_util.keystr(kp)} diverged",
        )


def test_segment_sum_rows_dedups():
    ids = jnp.asarray([5, 3, 5, 9, 3, 5], jnp.int32)
    rows = jnp.arange(6 * 4, dtype=jnp.float32).reshape(6, 4)
    uids, summed = segment_sum_rows(ids, rows)
    dense = jnp.zeros((12, 4)).at[ids].add(rows)
    rebuilt = jnp.zeros((12, 4)).at[uids].add(summed)
    np.testing.assert_allclose(np.asarray(rebuilt), np.asarray(dense))


def test_row_sparse_requires_factored_regime():
    with pytest.raises(ValueError, match="row_sparse_embedding"):
        build_optimizer(
            OptimizerConfig(row_sparse_embedding=True), 10
        )
