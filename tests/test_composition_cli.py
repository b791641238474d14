"""Config schema, registry, composition-root end-to-end (config → train →
export), and CLI plan rendering."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from specforge_tpu.algorithms.builtin import builtin_algorithm_registry
from specforge_tpu.algorithms.contracts import FeatureMode, assert_pure_value
from specforge_tpu.config.schema import Config, apply_overrides, load_config
from specforge_tpu.export.exporter import (
    REQUIRED_SGLANG_KEYS,
    export_to_sglang,
    flax_to_serving_state,
)
from tests._fixtures import H, V, VD, MAXLEN, write_offline_dataset

TINY_DRAFT_CONFIG = {
    "architectures": ["LlamaEagle3Draft"],
    "vocab_size": V,
    "draft_vocab_size": VD,
    "hidden_size": H,
    "intermediate_size": 64,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "num_hidden_layers": 1,
    "max_position_embeddings": 128,
}


def test_registry_has_all_algorithms():
    registry = builtin_algorithm_registry()
    assert registry.names == ("dflash", "domino", "dspark", "eagle3", "peagle")
    for reg in registry:
        assert_pure_value(reg.spec, reg.name)
        contract = reg.spec.contract_for(FeatureMode.OFFLINE)
        assert contract.required_features


def test_config_strict_and_overrides():
    config = Config.model_validate({"run_id": "x"})
    assert config.training.strategy == "eagle3"
    with pytest.raises(Exception):
        Config.model_validate({"nonexistent_section": {}})
    updated = apply_overrides(
        config, ["training.batch_size=4", "training.learning_rate=0.01"]
    )
    assert updated.training.batch_size == 4
    assert updated.training.learning_rate == 0.01
    with pytest.raises(Exception):
        apply_overrides(config, ["training.sp_ulysses_size=2"])  # usp-only


def test_config_topology_validation():
    with pytest.raises(Exception, match="disaggregated"):
        Config.model_validate(
            {"deployment": {"server_urls": ["http://x:9000"],
                            "mode": "colocated"}}
        )
    # peagle batches since round 3 (batched COD); bs>1 must validate
    assert Config.model_validate(
        {"training": {"strategy": "peagle", "batch_size": 2}}
    ).training.batch_size == 2
    with pytest.raises(Exception, match="mutually exclusive"):
        Config.model_validate({
            "model": {"draft_checkpoint_path": "/warm"},
            "training": {"resume_from": "/ckpt"},
        })
    with pytest.raises(Exception, match="trainer role"):
        Config.model_validate({
            "deployment": {"mode": "disaggregated"},
            "training": {"resume_from": "/ckpt", "role": "producer"},
        })


def _run_config(tmp_path, **training_overrides):
    data_dir = str(tmp_path / "data")
    if not os.path.exists(data_dir):
        write_offline_dataset(data_dir, n=8)
    return Config.model_validate({
        "run_id": "comp0",
        "output_dir": str(tmp_path / "runs"),
        "model": {"draft_config": TINY_DRAFT_CONFIG},
        "data": {"train_data_path": data_dir, "max_length": MAXLEN,
                 "num_workers": 0},
        "training": {
            "strategy": "eagle3", "batch_size": 2, "num_epochs": 1,
            "log_interval": 1, "ttt_length": 2, **training_overrides,
        },
        "tracking": {"backend": "none"},
    })


def test_composition_end_to_end_and_export(tmp_path):
    config = _run_config(tmp_path)
    rng = np.random.default_rng(0)
    frozen = {
        "target_head_weight": jnp.asarray(
            rng.normal(size=(V, H)).astype(np.float32)
        ),
    }
    from specforge_tpu.application.composition import build_training_run

    trainer = build_training_run(config, frozen_override=frozen)
    metrics = trainer.fit()
    assert int(trainer.state.step) == 4
    assert "eval/simulated_acc_len" not in metrics or True  # no eval loader

    # derived vocab mapping cached
    assert os.path.exists(tmp_path / "runs" / "comp0.vocab_mapping.npz")
    # t2d buffers installed (not the identity default)
    t2d = np.asarray(trainer.state.buffers["draft_model"]["t2d"])
    assert t2d.sum() == VD

    # export from the run root
    draft_cfg_path = str(tmp_path / "draft.json")
    with open(draft_cfg_path, "w") as f:
        json.dump(TINY_DRAFT_CONFIG, f)
    out = export_to_sglang(
        str(tmp_path / "runs"), str(tmp_path / "export"),
        draft_config_path=draft_cfg_path,
    )
    from safetensors.numpy import load_file

    tensors = load_file(os.path.join(out, "model.safetensors"))
    for key in REQUIRED_SGLANG_KEYS:
        assert key in tensors, sorted(tensors)
    assert tensors["lm_head.weight"].shape == (VD, H)
    assert tensors["fc.weight"].shape == (H, 3 * H)
    assert tensors["d2t"].dtype == np.int64
    assert not any("embed" in k for k in tensors)
    # weights round-trip: exported lm_head == transposed trained kernel
    kernel = np.asarray(
        trainer.state.params["draft_model"]["lm_head"]["kernel"], np.float32
    )
    np.testing.assert_allclose(
        tensors["lm_head.weight"].astype(np.float32), kernel.T, rtol=1e-2,
        atol=1e-2,
    )
    with open(os.path.join(out, "config.json")) as f:
        assert json.load(f)["draft_vocab_size"] == VD


def test_serving_state_key_conversion():
    params = {
        "midlayer": {
            "self_attn": {"q_proj": {"kernel": np.ones((4, 8), np.float32)}},
            "hidden_norm": {"weight": np.ones(4, np.float32)},
        },
        "layers_0": {"mlp": {"gate_proj": {"kernel": np.ones((4, 6))}}},
        "fc_norm_1": {"weight": np.ones(4)},
        "embed_tokens": {"embedding": np.ones((10, 4))},
        "prefix_gru": {"weight_ih": np.ones((12, 4))},
        "embed_proj_1": {"kernel": np.ones((4, 10))},
    }
    out = flax_to_serving_state(params)
    assert out["midlayer.self_attn.q_proj.weight"].shape == (8, 4)
    assert "midlayer.hidden_norm.weight" in out
    assert "layers.0.mlp.gate_proj.weight" in out
    assert "fc_norm.1.weight" in out
    assert out["embed_tokens.weight"].shape == (10, 4)
    assert "prefix_gru.weight_ih_l0" in out
    assert "embed_proj.2.weight" in out


def test_cli_plan(tmp_path, capsys):
    config_path = str(tmp_path / "cfg.json")
    with open(config_path, "w") as f:
        json.dump({
            "run_id": "plan0",
            "model": {"draft_config": TINY_DRAFT_CONFIG},
        }, f)
    from specforge_tpu.cli import main

    rc = main(["train", "-c", config_path, "--plan",
               "--set", "training.batch_size=3"])
    assert rc == 0
    rendered = json.loads(capsys.readouterr().out)
    assert rendered["training"]["batch_size"] == 3
    assert rendered["run_id"] == "plan0"


def test_cli_train_colocated_in_process(tmp_path, capsys):
    """The actual `specforge-tpu train` path end-to-end (colocated, tiny)."""
    from tests._fixtures import write_offline_dataset

    data_dir = str(tmp_path / "clidata")
    write_offline_dataset(data_dir, n=4)
    # the tiny fixture has no target checkpoint: use an explicit vocab mapping
    import numpy as np

    from specforge_tpu.training.vocab_mapping import save_vocab_mapping
    from tests._fixtures import make_vocab_maps

    t2d, d2t = make_vocab_maps()
    mapping_path = str(tmp_path / "vm.npz")
    save_vocab_mapping(mapping_path, t2d, d2t)

    # build a frozen head on disk? the CLI path loads target tables only when
    # target_model_path is set; for hidden_state batches we must provide one.
    from transformers import LlamaConfig, LlamaForCausalLM
    import torch

    target_dir = str(tmp_path / "target")
    torch.manual_seed(0)
    LlamaForCausalLM(LlamaConfig(
        vocab_size=V, hidden_size=H, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    )).save_pretrained(target_dir, safe_serialization=True)

    config_path = str(tmp_path / "cli.json")
    with open(config_path, "w") as f:
        json.dump({
            "run_id": "cli0",
            "output_dir": str(tmp_path / "runs"),
            "model": {
                "target_model_path": target_dir,
                "draft_config": TINY_DRAFT_CONFIG,
                "vocab_mapping_path": mapping_path,
            },
            "data": {"train_data_path": data_dir, "max_length": MAXLEN,
                     "num_workers": 0},
            "training": {"strategy": "eagle3", "batch_size": 2,
                         "num_epochs": 1, "ttt_length": 2, "log_interval": 1},
            "tracking": {"backend": "none"},
        }, f)
    from specforge_tpu.cli import main

    rc = main(["train", "-c", config_path])
    assert rc == 0
    assert (tmp_path / "runs" / "cli0-step2" / "contract.json").exists()
