"""Warm start (weights-only) + provenance fingerprints."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from specforge_tpu.training.model_loading import (
    draft_config_fingerprint,
    frozen_input_fingerprint,
    warm_start_draft,
)
from tests._fixtures import build_model_and_strategy


def test_fingerprints_stable_and_sensitive(tmp_path):
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    (model_dir / "config.json").write_text('{"hidden_size": 32}')
    (model_dir / "model.safetensors").write_bytes(b"abc")
    fp1 = frozen_input_fingerprint(str(model_dir))
    fp2 = frozen_input_fingerprint(str(model_dir))
    assert fp1 == fp2 and len(fp1) == 16
    (model_dir / "model.safetensors").write_bytes(b"abcd")  # size change
    assert frozen_input_fingerprint(str(model_dir)) != fp1
    assert frozen_input_fingerprint(None) == ""

    cfg_fp = draft_config_fingerprint({"a": 1, "b": 2})
    assert cfg_fp == draft_config_fingerprint({"b": 2, "a": 1})  # order-free
    assert cfg_fp != draft_config_fingerprint({"a": 1, "b": 3})


def test_warm_start_from_export(tmp_path):
    # train-ish: perturb a model, export it, warm start a fresh one
    from specforge_tpu.export.exporter import flax_to_serving_state
    from safetensors.numpy import save_file

    _model, _strategy, variables, _frozen = build_model_and_strategy(seed=0)
    draft = variables["params"]["draft_model"]
    perturbed = jax.tree_util.tree_map(lambda x: x + 0.5, draft)
    serving = flax_to_serving_state(
        perturbed, variables["buffers"]["draft_model"], dtype="float32"
    )
    export_dir = tmp_path / "export"
    export_dir.mkdir()
    save_file(serving, str(export_dir / "model.safetensors"))

    _m2, _s2, fresh, _f2 = build_model_and_strategy(seed=9)
    warmed = warm_start_draft(fresh, str(export_dir))
    got = np.asarray(
        warmed["params"]["draft_model"]["lm_head"]["kernel"], np.float32
    )
    want = np.asarray(perturbed["lm_head"]["kernel"], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # buffers restored too
    np.testing.assert_array_equal(
        np.asarray(warmed["buffers"]["draft_model"]["t2d"]),
        np.asarray(variables["buffers"]["draft_model"]["t2d"]),
    )


def test_warm_start_from_checkpoint(tmp_path):
    import optax

    from specforge_tpu.training.checkpoint import (
        CheckpointManager,
        Progress,
        ResumeContract,
    )
    from specforge_tpu.training.optimizer import OptimizerConfig, build_optimizer
    from specforge_tpu.training.train_step import TrainState

    _m, _s, variables, _f = build_model_and_strategy(seed=0)
    tx = build_optimizer(OptimizerConfig(), 10)
    state = TrainState.create(variables["params"], variables["buffers"], tx)
    manager = CheckpointManager(str(tmp_path / "runs"), "w0")
    contract = ResumeContract(
        strategy="eagle3", world_size=1, train_batch_size=2, accum_steps=1,
        total_steps=10, run_id="w0",
    )
    manager.save(state, 3, contract, Progress(global_step=3))

    _m2, _s2, fresh, _f2 = build_model_and_strategy(seed=7)
    warmed = warm_start_draft(fresh, str(tmp_path / "runs"))
    np.testing.assert_allclose(
        np.asarray(warmed["params"]["draft_model"]["fc"]["kernel"]),
        np.asarray(variables["params"]["draft_model"]["fc"]["kernel"]),
        rtol=1e-6,
    )


def test_merged_proj_export_split_and_warm_start_fold(tmp_path):
    """DFlash merged qkv_proj/gate_up_proj: the exporter splits them into
    torch-convention q/k/v (gate/up) tensors, and warm start folds those
    back into the merged kernels bit-exactly (roundtrip identity)."""
    from safetensors.numpy import save_file

    from specforge_tpu.export.exporter import flax_to_serving_state
    from specforge_tpu.models.draft.dflash import DFlashConfig, DFlashDraftModel
    from specforge_tpu.training.model_loading import _load_from_safetensors

    cfg = DFlashConfig(
        architectures=("DFlashDraftModel",),
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_hidden_layers=2, max_position_embeddings=128,
        block_size=4, num_target_layers=8,
    )
    model = DFlashDraftModel(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    b, n, blk, s = 1, 2, 4, 16
    draft_hidden = jnp.asarray(rng.normal(size=(b, n * blk, 32)), jnp.float32)
    context = jnp.asarray(rng.normal(size=(b, s, 32)), jnp.float32)
    ctx_pos = jnp.tile(jnp.arange(s)[None], (b, 1))
    anchors = jnp.asarray([[3, 9]], jnp.int32)
    draft_pos = (anchors[..., None] + jnp.arange(blk)[None, None]).reshape(b, -1)
    keep = jnp.ones((b, n), bool)
    params = model.init(
        jax.random.PRNGKey(0), draft_hidden, context, ctx_pos, draft_pos,
        anchors, keep,
    )["params"]

    serving = flax_to_serving_state(params, dtype="float32")
    attn = params["layers_0"]["self_attn"]
    qd = 4 * 8
    kvd = 2 * 8
    # split tensors present with torch shapes [out, in]
    assert serving["layers.0.self_attn.q_proj.weight"].shape == (qd, 32)
    assert serving["layers.0.self_attn.k_proj.weight"].shape == (kvd, 32)
    assert serving["layers.0.mlp.gate_proj.weight"].shape == (48, 32)
    assert "layers.0.self_attn.qkv_proj.weight" not in serving
    assert "layers.0.mlp.gate_up_proj.weight" not in serving
    # split pieces match the merged kernel columns
    merged = np.asarray(attn["qkv_proj"]["kernel"])
    np.testing.assert_array_equal(
        serving["layers.0.self_attn.q_proj.weight"],
        merged[:, :qd].T.astype(np.float32),
    )
    np.testing.assert_array_equal(
        serving["layers.0.self_attn.v_proj.weight"],
        merged[:, qd + kvd:].T.astype(np.float32),
    )

    # warm start a fresh draft from the exported file: fold must restore the
    # merged kernels exactly
    path = os.path.join(tmp_path, "model.safetensors")
    save_file({k: np.ascontiguousarray(v) for k, v in serving.items()}, path)
    fresh = model.init(
        jax.random.PRNGKey(7), draft_hidden, context, ctx_pos, draft_pos,
        anchors, keep,
    )["params"]
    folded, _ = _load_from_safetensors(path, fresh, {})
    np.testing.assert_allclose(
        np.asarray(folded["layers_0"]["self_attn"]["qkv_proj"]["kernel"]),
        merged, rtol=0, atol=0,
    )
    np.testing.assert_allclose(
        np.asarray(folded["layers_1"]["mlp"]["gate_up_proj"]["kernel"]),
        np.asarray(params["layers_1"]["mlp"]["gate_up_proj"]["kernel"]),
        rtol=0, atol=0,
    )
