"""DFlash-family SGLang export: train → export → reload → block spec-decode.

The reference ships DFlash/DSpark serving-export normalization + a chat
serving gate (scripts/gates/normalize_dflash_export.py,
run_dflash_chat_serving_gate.py); the round-2 exporter refused everything
but eagle3. These tests train tiny Domino and DSpark drafts through the
production composition, export them with the sglang layout (config
normalization included), reload through the production loader, and require
exact greedy-equivalence in block speculation — the full serving contract.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from specforge_tpu.config.schema import Config
from specforge_tpu.export.exporter import export_to_sglang
from specforge_tpu.models.target.transformer import (
    TargetConfig,
    load_target_params,
)
from specforge_tpu.offline_capture.capture import (
    OfflineCaptureConfig,
    OfflineCaptureRunner,
)

V, H = 128, 32
SEQ = 32
CAPTURE = (1, 4)


@pytest.fixture(scope="module")
def target(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    target_dir = str(tmp_path_factory.mktemp("dflash-export-target"))
    torch.manual_seed(0)
    LlamaForCausalLM(LlamaConfig(
        vocab_size=V, hidden_size=H, intermediate_size=64,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
    )).save_pretrained(target_dir, safe_serialization=True)
    return target_dir


@pytest.fixture(scope="module")
def features(target, tmp_path_factory):
    rng = np.random.default_rng(0)
    samples = [
        {"input_ids": rng.integers(0, V - 1, size=SEQ).astype(np.int64),
         "loss_mask": np.ones(SEQ, np.int64)}
        for _ in range(8)
    ]
    features_dir = str(tmp_path_factory.mktemp("dflash-export-features"))
    OfflineCaptureRunner(OfflineCaptureConfig(
        target_model_path=target, output_dir=features_dir,
        capture_layers=CAPTURE, max_length=SEQ, batch_size=8,
        layout="dflash",
    )).run(samples)
    return features_dir


def _draft_config(projector: str):
    cfg = {
        "architectures": [{
            "domino": "DominoDraftModel", "dspark": "DSparkDraftModel",
        }[projector]],
        "vocab_size": V, "hidden_size": H, "intermediate_size": 64,
        "num_attention_heads": 4, "num_key_value_heads": 2, "head_dim": 8,
        "num_hidden_layers": 2, "num_target_layers": 6, "block_size": 4,
        "max_position_embeddings": 512,
        "dflash_config": {
            "mask_token_id": V - 1,
            "target_layer_ids": list(CAPTURE),
            "projector_type": projector,
        },
    }
    if projector == "domino":
        cfg["dflash_config"].update({
            "pure_draft_prefix_len": 1, "emb_dim": 16,
            "gru_hidden_dim": 24, "shift_label": True,
        })
    else:
        cfg["dflash_config"].update({
            "markov_rank": 8, "markov_head_type": "gated",
            "enable_confidence_head": True,
        })
    return cfg


def _train_and_export(tmp_path, target, features, projector):
    from specforge_tpu.application.composition import build_training_run

    draft_config = _draft_config(projector)
    run_config = Config.model_validate({
        "run_id": f"exp-{projector}",
        "output_dir": str(tmp_path / "runs"),
        "model": {"target_model_path": target,
                  "draft_config": draft_config},
        "data": {"train_data_path": features, "max_length": SEQ,
                 "num_workers": 0},
        "training": {"strategy": projector, "batch_size": 4,
                     "num_epochs": 1, "ttt_length": 2, "log_interval": 1,
                     "max_checkpoints": 1, "num_anchors": 4},
        "tracking": {"backend": "none"},
    })
    trainer = build_training_run(run_config)
    trainer.fit()
    draft_cfg_path = str(tmp_path / "draft.json")
    with open(draft_cfg_path, "w") as f:
        json.dump(draft_config, f)
    return export_to_sglang(
        str(tmp_path / "runs"), str(tmp_path / "export"),
        draft_config_path=draft_cfg_path,
    ), draft_config


def test_domino_export_reload_block_spec_decode(tmp_path, target, features):
    from safetensors.numpy import load_file

    export_dir, _ = _train_and_export(tmp_path, target, features, "domino")

    tensors = load_file(os.path.join(export_dir, "model.safetensors"))
    for key in ("fc.weight", "hidden_norm.weight", "norm.weight",
                "prefix_gru.weight_ih_l0", "prefix_gru.weight_hh_l0",
                "embed_proj.0.weight", "embed_proj.2.weight"):
        assert key in tensors, sorted(tensors)
    with open(os.path.join(export_dir, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["architectures"] == ["DFlashDraftModel"]
    assert cfg["block_size"] == 4
    assert cfg["dflash_config"]["projector_type"] == "domino"

    # reload + block speculation with the GRU head applied causally —
    # must emit exactly the target's greedy sequence
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(__file__), "..", "scripts", "gates"
    ))
    from dflash_serving_gate import run_gate

    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, V - 2, size=10).tolist() for _ in range(2)]
    summary = run_gate(target, export_dir, prompts, max_new_tokens=12)
    assert summary["greedy_equivalent"]
    assert summary["projector"] == "domino"
    assert 1.0 <= summary["mean_accept_length"] <= 4.0


def test_dspark_export_normalization_and_reload(tmp_path, target, features):
    from safetensors.numpy import load_file

    export_dir, _ = _train_and_export(tmp_path, target, features, "dspark")

    tensors = load_file(os.path.join(export_dir, "model.safetensors"))
    for key in ("fc.weight", "markov_head.markov_w1.weight",
                "markov_head.markov_w2.weight",
                "markov_head.gate_proj.weight"):
        assert key in tensors, sorted(tensors)
    with open(os.path.join(export_dir, "config.json")) as f:
        cfg = json.load(f)
    # reference normalize_dflash_export hoists the dspark method fields
    assert cfg["architectures"] == ["Qwen3DSparkModel"]
    assert cfg["markov_rank"] == 8
    assert cfg["markov_head_type"] == "gated"
    assert cfg["enable_confidence_head"] is True

    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(__file__), "..", "scripts", "gates"
    ))
    from dflash_serving_gate import run_gate

    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, V - 2, size=10).tolist()]
    summary = run_gate(target, export_dir, prompts, max_new_tokens=12)
    assert summary["greedy_equivalent"]
    assert summary["projector"] == "dspark"


def test_export_requires_block_size(tmp_path, target, features):
    """A draft config without block_size must fail loudly, not export a
    config SGLang cannot serve."""
    from specforge_tpu.export.exporter import _export_dflash_to_sglang

    bad = {"architectures": ["DominoDraftModel"],
           "dflash_config": {"projector_type": "domino"}}
    bad_path = str(tmp_path / "bad.json")
    with open(bad_path, "w") as f:
        json.dump(bad, f)
    with pytest.raises(ValueError, match="block_size"):
        _export_dflash_to_sglang(
            {"params": {}}, "domino", str(tmp_path / "out"),
            draft_config_path=bad_path,
        )
