"""Factored-second-moment optimizer: exactness on rank-1 g^2, state-size
placeholders, momentum-free (b1=0) mode, and loss decrease end-to-end.

The factored transform is the single-chip answer to the reference
BF16Optimizer's CPU offload (specforge/optimizer.py:12-232) for drafts with
trainable vocab-size embeddings (P-EAGLE): O(r+c) second-moment state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from specforge_tpu.training.optimizer import (
    OptimizerConfig,
    build_optimizer,
)


def _tree_allclose(a, b, rtol=1e-5, atol=1e-7):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol
        ),
        a, b,
    )


def _rank1_grads(key, params):
    """Gradients whose elementwise square is exactly rank-1 per matrix leaf
    (g = outer(u, v) => g^2 = outer(u^2, v^2)), so the Adafactor R*C/sum(R)
    reconstruction is exact and factored Adam must equal dense Adam."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = []
    for k, p in zip(keys, leaves):
        if p.ndim == 2:
            ku, kv = jax.random.split(k)
            u = jax.random.normal(ku, (p.shape[0],))
            v = jax.random.normal(kv, (p.shape[1],))
            out.append(jnp.outer(u, v) * 0.01)
        else:
            out.append(jax.random.normal(k, p.shape) * 0.01)
    return jax.tree_util.tree_unflatten(treedef, out)


def _params():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "embed": jax.random.normal(k1, (32, 16)),  # factored (min_dim=8)
        "bias": jax.random.normal(k2, (16,)),      # 1D: always dense
        "small": jax.random.normal(k3, (4, 16)),   # below min_dim: dense
    }


def _run(tx, params, grads, steps=3):
    state = tx.init(params)
    for _ in range(steps):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params, state


def test_factored_matches_dense_on_rank1_grads():
    params = _params()
    grads = _rank1_grads(jax.random.PRNGKey(1), params)
    base = dict(lr=1e-3, warmup_ratio=0.0, lr_scheduler="constant",
                weight_decay=0.01)
    dense_cfg = OptimizerConfig(**base)
    fact_cfg = OptimizerConfig(
        **base, factored_second_moments=True, factored_min_dim=8
    )
    p_dense, _ = _run(build_optimizer(dense_cfg, 10), params, grads)
    p_fact, _ = _run(build_optimizer(fact_cfg, 10), params, grads)
    _tree_allclose(p_dense, p_fact, rtol=1e-5, atol=1e-7)


def test_factored_state_shapes_are_compressed():
    params = _params()
    cfg = OptimizerConfig(
        lr=1e-3, factored_second_moments=True, factored_min_dim=8
    )
    tx = build_optimizer(cfg, 10)
    state = tx.init(params)
    # chain: (clip, chain(factored_adam, wd, lr)) — find the factored state
    flat = [
        s for s in jax.tree_util.tree_leaves(
            state, is_leaf=lambda x: hasattr(x, "nu_row")
        )
        if hasattr(s, "nu_row")
    ]
    assert len(flat) == 1
    fs = flat[0]
    # factored leaf: dense nu is a (1,) placeholder, row/col carry the state
    assert fs.nu["embed"].shape == (1,)
    assert fs.nu_row["embed"].shape == (32,)
    assert fs.nu_col["embed"].shape == (16,)
    # non-factored leaves: dense nu, placeholder row/col
    assert fs.nu["bias"].shape == (16,)
    assert fs.nu_row["bias"].shape == (1,)
    assert fs.nu["small"].shape == (4, 16)
    assert fs.nu_col["small"].shape == (1,)
    # b1 > 0: mu is dense everywhere
    assert fs.mu["embed"].shape == (32, 16)


def test_momentum_free_drops_first_moment():
    params = _params()
    cfg = OptimizerConfig(
        lr=1e-3, adam_b1=0.0, factored_second_moments=True,
        factored_min_dim=8,
    )
    tx = build_optimizer(cfg, 10)
    state = tx.init(params)
    fs = [
        s for s in jax.tree_util.tree_leaves(
            state, is_leaf=lambda x: hasattr(x, "nu_row")
        )
        if hasattr(s, "nu_row")
    ][0]
    assert fs.mu["embed"].shape == (1,)
    assert fs.mu["bias"].shape == (1,)
    grads = _rank1_grads(jax.random.PRNGKey(2), params)
    p2, _ = _run(tx, params, grads)
    for leaf, before in zip(
        jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(params)
    ):
        assert np.isfinite(np.asarray(leaf)).all()
        assert not np.allclose(np.asarray(leaf), np.asarray(before))


def test_factored_loss_decreases_on_quadratic():
    # min ||W x - y||^2 with the factored optimizer: loss must fall.
    key = jax.random.PRNGKey(3)
    kw, kx, ky = jax.random.split(key, 3)
    W = jax.random.normal(kw, (16, 16)) * 0.1
    x = jax.random.normal(kx, (16,))
    y = jax.random.normal(ky, (16,))
    params = {"W": W}
    cfg = OptimizerConfig(
        lr=5e-2, warmup_ratio=0.0, lr_scheduler="constant",
        factored_second_moments=True, factored_min_dim=8,
    )
    tx = build_optimizer(cfg, 100)
    state = tx.init(params)

    def loss_fn(p):
        return jnp.sum((p["W"] @ x - y) ** 2)

    losses = []
    for _ in range(30):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < 0.2 * losses[0]


def test_factored_state_checkpoint_roundtrip_structure():
    # FactoredAdamState must survive flatten/unflatten (orbax keys off the
    # pytree structure + leaf shapes).
    params = _params()
    cfg = OptimizerConfig(
        lr=1e-3, factored_second_moments=True, factored_min_dim=8
    )
    tx = build_optimizer(cfg, 10)
    state = tx.init(params)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    _tree_allclose(state, rebuilt, rtol=0, atol=0)
