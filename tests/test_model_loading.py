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
