"""End-to-end offline training slice: train → checkpoint → resume → eval,
all through the production loader/trainer/checkpoint paths."""

import json
import os

import numpy as np
import pytest

from specforge_tpu.training.optimizer import OptimizerConfig, embedding_freeze_mask
from specforge_tpu.training.trainer import Trainer, TrainerConfig
from specforge_tpu.training.tracking import JsonlTracker
from tests._fixtures import (
    build_model_and_strategy,
    build_offline_loader,
    write_offline_dataset,
)


def make_trainer(tmp_path, run_id="t0", num_epochs=2, resume=False,
                 accum_steps=1, eval_too=True, resume_from=None):
    data_dir = str(tmp_path / "data")
    if not os.path.exists(data_dir):
        write_offline_dataset(data_dir, n=8)
    train_loader = build_offline_loader(data_dir, batch_size=2)
    eval_loader = build_offline_loader(data_dir, batch_size=2) if eval_too else None
    model, strategy, variables, frozen = build_model_and_strategy()
    mask = embedding_freeze_mask(variables["params"])
    config = TrainerConfig(
        num_epochs=num_epochs,
        accum_steps=accum_steps,
        log_interval=1,
        output_dir=str(tmp_path / "runs"),
        run_id=run_id,
        resume=resume,
        resume_from=resume_from,
        max_checkpoints=3,
    )
    tracker = JsonlTracker(str(tmp_path / "runs" / f"{run_id}.metrics.jsonl"))
    return Trainer(
        strategy,
        variables=variables,
        train_loader=train_loader,
        eval_loader=eval_loader,
        config=config,
        optimizer_config=OptimizerConfig(lr=1e-3, warmup_ratio=0.1),
        frozen=frozen,
        tracker=tracker,
        trainable_mask=mask,
        metadata={"target_repr": "hidden_state"},
    )


def test_fit_checkpoints_and_eval(tmp_path):
    trainer = make_trainer(tmp_path)
    metrics = trainer.fit()
    # 8 samples / batch 2 = 4 steps per epoch × 2 epochs
    assert int(trainer.state.step) == 8
    assert "eval/simulated_acc_len" in metrics
    assert 0.0 <= metrics["eval/simulated_acc_len"] <= trainer.strategy.model.length
    ckpt_dir = tmp_path / "runs" / "t0-step8"
    assert (ckpt_dir / "contract.json").exists()
    # metrics jsonl written
    lines = (tmp_path / "runs" / "t0.metrics.jsonl").read_text().splitlines()
    records = [json.loads(l) for l in lines]
    assert any("train/loss" in r for r in records)
    assert any("perf/steps_per_hour" in r for r in records)


def test_resume_restores_state_exactly(tmp_path):
    t1 = make_trainer(tmp_path, run_id="r0", num_epochs=1)
    t1.fit()
    assert int(t1.state.step) == 4

    # identical config resume: run is complete → restores and does no work
    t2 = make_trainer(tmp_path, run_id="r0", num_epochs=1, resume=True)
    t2.fit()
    assert int(t2.state.step) == 4
    p1 = np.asarray(t1.state.params["draft_model"]["lm_head"]["kernel"])
    p2 = np.asarray(t2.state.params["draft_model"]["lm_head"]["kernel"])
    np.testing.assert_array_equal(p1, p2)


def test_resume_mid_run_reaches_same_weights(tmp_path):
    # uninterrupted run
    t_full = make_trainer(tmp_path, run_id="full", num_epochs=2, eval_too=False)
    t_full.fit()
    assert int(t_full.state.step) == 8

    # interrupted twin: same data/seed, checkpoint every 2 steps; simulate a
    # crash after step 6 by pointing .latest at the step-6 checkpoint
    tmp2 = tmp_path
    t_a = make_trainer(tmp2, run_id="int", num_epochs=2, eval_too=False)
    t_a.config.checkpoint_interval = 2
    t_a.fit()
    latest = tmp2 / "runs" / "int.latest"
    latest.write_text("6")

    t_b = make_trainer(tmp2, run_id="int", num_epochs=2, resume=True,
                       eval_too=False)
    t_b.config.checkpoint_interval = 0
    t_b.fit()
    assert int(t_b.state.step) == 8
    pf = np.asarray(t_full.state.params["draft_model"]["lm_head"]["kernel"])
    pb = np.asarray(t_b.state.params["draft_model"]["lm_head"]["kernel"])
    np.testing.assert_allclose(pf, pb, rtol=1e-5, atol=1e-7)


def test_resume_from_explicit_checkpoint(tmp_path):
    """training.resume_from: full restore from ANOTHER run's checkpoint —
    a step dir or a run root (reference trainer.py:104,281)."""
    t1 = make_trainer(tmp_path, run_id="src", num_epochs=2, eval_too=False)
    t1.config.checkpoint_interval = 2
    t1.fit()
    step_dir = str(tmp_path / "runs" / "src-step4")
    assert os.path.isdir(step_dir)

    # resume from the explicit mid-run step dir under a NEW run id
    t2 = make_trainer(
        tmp_path, run_id="dst", num_epochs=2, eval_too=False,
        resume_from=step_dir,
    )
    t2.fit()
    assert int(t2.state.step) == 8

    # run-root form resolves via the .latest marker — but a root holding
    # multiple runs is ambiguous and must refuse (src + dst both live here)
    t3 = make_trainer(
        tmp_path, run_id="dst2", num_epochs=2, eval_too=False,
        resume_from=str(tmp_path / "runs"),
    )
    with pytest.raises(ValueError, match="holds 2 runs"):
        t3.fit()

    # single-run root resolves fine
    os.remove(str(tmp_path / "runs" / "dst.latest"))
    t4 = make_trainer(
        tmp_path, run_id="dst3", num_epochs=2, eval_too=False,
        resume_from=str(tmp_path / "runs"),
    )
    t4.fit()
    assert int(t4.state.step) == 8

    # crash-relaunch of a resume_from config: the run's OWN newer
    # checkpoint (resume=True) wins over the explicit source
    t5 = make_trainer(
        tmp_path, run_id="dst", num_epochs=2, eval_too=False, resume=True,
        resume_from=step_dir,
    )
    t5.fit()
    assert int(t5.state.step) == 8  # restored dst's own step-8, no rewind


def test_resume_contract_mismatch_refuses(tmp_path):
    t1 = make_trainer(tmp_path, run_id="c0", num_epochs=1)
    t1.fit()
    t2 = make_trainer(tmp_path, run_id="c0", num_epochs=2, resume=True,
                      accum_steps=2)
    with pytest.raises(ValueError, match="resume contract mismatch"):
        t2.fit()


def test_accumulation_window(tmp_path):
    trainer = make_trainer(tmp_path, run_id="a0", num_epochs=1, accum_steps=2,
                           eval_too=False)
    trainer.fit()
    # 8 samples / batch 2 / accum 2 = 2 optimizer steps
    assert int(trainer.state.step) == 2
