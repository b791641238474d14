"""USP end-to-end training: the production composition path building the
(sp_ulysses × sp_ring) mesh and running full training steps must match the
dense-attention run — losses to ~1e-5, final weights close (VERDICT item 2;
ref OfflineEagle3Dataset.process_data_usp + eagle3_adapters.py:106-156)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from specforge_tpu.application.composition import build_training_run
from specforge_tpu.config.schema import Config
from tests._fixtures import H, MAXLEN, V, write_offline_dataset
from tests.test_multihost import TINY_DRAFT_CONFIG


def _payload(workdir, backend, out_sub):
    training = {
        "strategy": "eagle3",
        "attention_backend": backend,
        "batch_size": 1,
        "num_epochs": 1,
        "log_interval": 1,
        "ttt_length": 2,
        "learning_rate": 1e-3,
    }
    if backend == "usp":
        training["sp_ulysses_size"] = 2
        training["sp_ring_size"] = 4
    return {
        "run_id": f"usp-{backend}",
        "output_dir": os.path.join(workdir, out_sub),
        # float32 compute: the parity gate compares reordered-softmax math
        "model": {"draft_config": TINY_DRAFT_CONFIG,
                  "compute_dtype": "float32"},
        "data": {
            "train_data_path": os.path.join(workdir, "data"),
            "max_length": MAXLEN,
            "num_workers": 0,
        },
        "training": training,
        "tracking": {"backend": "jsonl"},
    }


def _run(workdir, backend):
    config = Config.model_validate(_payload(workdir, backend, f"runs_{backend}"))
    rng = np.random.default_rng(7)
    frozen = {
        "target_head_weight": jnp.asarray(
            rng.normal(size=(V, H)).astype(np.float32)
        )
    }
    trainer = build_training_run(config, frozen_override=frozen)
    trainer.fit()
    params = {
        "/".join(k): np.asarray(jax.device_get(leaf), np.float32)
        for k, leaf in traverse_util.flatten_dict(trainer.state.params).items()
    }
    jsonl = os.path.join(
        workdir, f"runs_{backend}", f"usp-{backend}.metrics.jsonl"
    )
    losses = [
        json.loads(line)["train/loss"]
        for line in open(jsonl)
        if "train/loss" in json.loads(line)
    ]
    return params, losses, trainer


def test_usp_training_matches_dense(tmp_path):
    workdir = str(tmp_path)
    write_offline_dataset(os.path.join(workdir, "data"), n=4)

    dense_params, dense_losses, _ = _run(workdir, "dense")
    usp_params, usp_losses, usp_trainer = _run(workdir, "usp")

    # the composition actually built the sp mesh + usp draft
    assert usp_trainer.mesh is not None
    assert dict(usp_trainer.mesh.shape)["sp_ring"] == 4
    assert usp_trainer.strategy.model.draft_model.attention_backend == "usp"

    assert len(usp_losses) == len(dense_losses) == 4
    np.testing.assert_allclose(usp_losses, dense_losses, rtol=2e-5, atol=1e-5)
    for name in dense_params:
        np.testing.assert_allclose(
            usp_params[name], dense_params[name], rtol=1e-4, atol=1e-5,
            err_msg=name,
        )


@pytest.mark.slow
def test_usp_training_two_process(tmp_path):
    """SP axes spanning processes: both hosts load the SAME samples (batch
    block shared), each materializing its sequence chunk — must match the
    single-process USP run."""
    from tests.test_multihost import _run_workers

    workdir = str(tmp_path)
    write_offline_dataset(os.path.join(workdir, "data"), n=4)
    payload = _payload(workdir, "usp", "runs_mh")
    with open(os.path.join(workdir, "run_config.json"), "w") as f:
        json.dump(payload, f)
    _run_workers(workdir, num_epochs=1, resume=False)

    single_params, single_losses, _ = _run(workdir, "usp")
    mh = np.load(os.path.join(workdir, "mh_params.npz"))
    for name in single_params:
        np.testing.assert_allclose(
            mh[name], single_params[name], rtol=2e-5, atol=2e-6, err_msg=name
        )


def test_usp_config_requires_divisible_max_length(tmp_path):
    workdir = str(tmp_path)
    write_offline_dataset(os.path.join(workdir, "data"), n=2)
    payload = _payload(workdir, "usp", "runs_bad")
    payload["data"]["max_length"] = MAXLEN - 1
    config = Config.model_validate(payload)
    with pytest.raises(ValueError, match="divisible"):
        build_training_run(config, frozen_override={})
