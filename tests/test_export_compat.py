"""Export/capture compatibility shims.

- apply_legacy_rope_scaling: exported configs mirror modern
  ``rope_parameters`` <-> legacy ``rope_scaling`` so both generations of
  serving-stack config parsers load the draft identically (reference
  specforge/export/checkpoint_io.py:32-72, applied on every export).
- muP width-multiplier fold: targets declaring
  ``logits_mup_width_multiplier`` get the multiplier folded into the loaded
  lm_head ONCE (reference target_utils.py:140-153 +
  patches/sglang/v0.5.14/spec-capture.patch LogitsProcessor hunk), so the
  captured last hidden stays canonical and teacher logits match serving.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from specforge_tpu.export.exporter import apply_legacy_rope_scaling


def _write_cfg(tmp_path, cfg):
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(cfg, f)


def _read_cfg(tmp_path):
    with open(os.path.join(tmp_path, "config.json")) as f:
        return json.load(f)


def test_rope_modern_mirrors_to_legacy(tmp_path):
    _write_cfg(tmp_path, {
        "rope_parameters": {
            "rope_type": "yarn", "factor": 4.0, "rope_theta": 500000.0,
        },
    })
    assert apply_legacy_rope_scaling(str(tmp_path))
    cfg = _read_cfg(tmp_path)
    assert cfg["rope_theta"] == 500000.0
    assert cfg["rope_scaling"] == {"rope_type": "yarn", "factor": 4.0}
    # modern block untouched
    assert cfg["rope_parameters"]["rope_theta"] == 500000.0


def test_rope_legacy_mirrors_to_modern(tmp_path):
    _write_cfg(tmp_path, {
        "rope_theta": 1000000.0,
        "rope_scaling": {"type": "linear", "factor": 2.0},
    })
    assert apply_legacy_rope_scaling(str(tmp_path))
    cfg = _read_cfg(tmp_path)
    assert cfg["rope_parameters"] == {
        "type": "linear", "factor": 2.0, "rope_theta": 1000000.0,
    }


def test_rope_default_kind_is_noop(tmp_path):
    original = {"rope_parameters": {"rope_type": "default",
                                    "rope_theta": 10000.0}}
    _write_cfg(tmp_path, original)
    # rope_theta still hoisted (legacy readers need the top-level copy),
    # but no rope_scaling is invented for the default kind
    assert apply_legacy_rope_scaling(str(tmp_path))
    cfg = _read_cfg(tmp_path)
    assert cfg["rope_theta"] == 10000.0
    assert "rope_scaling" not in cfg


def test_rope_no_rope_fields_is_noop(tmp_path):
    _write_cfg(tmp_path, {"hidden_size": 32})
    assert not apply_legacy_rope_scaling(str(tmp_path))
    assert _read_cfg(tmp_path) == {"hidden_size": 32}


def test_rope_both_present_is_noop(tmp_path):
    original = {
        "rope_theta": 500000.0,
        "rope_parameters": {"rope_type": "yarn", "factor": 4.0,
                            "rope_theta": 500000.0},
        "rope_scaling": {"rope_type": "yarn", "factor": 4.0},
    }
    _write_cfg(tmp_path, original)
    assert not apply_legacy_rope_scaling(str(tmp_path))


def test_rope_env_disable(tmp_path, monkeypatch):
    monkeypatch.setenv("SPECFORGE_DISABLE_LEGACY_ROPE_SCALING", "1")
    _write_cfg(tmp_path, {
        "rope_parameters": {"rope_type": "yarn", "rope_theta": 1.0},
    })
    assert not apply_legacy_rope_scaling(str(tmp_path))
    assert "rope_scaling" not in _read_cfg(tmp_path)


def test_export_writes_mirrored_rope(tmp_path):
    """_write_config (both export layouts route through it or call the shim
    directly) mirrors the draft config's modern rope block."""
    from specforge_tpu.export.exporter import _write_config

    draft_cfg = os.path.join(tmp_path, "draft.json")
    with open(draft_cfg, "w") as f:
        json.dump({
            "architectures": ["LlamaEagle3Draft"],
            "rope_parameters": {"rope_type": "llama3", "factor": 8.0,
                                "rope_theta": 500000.0},
        }, f)
    out = os.path.join(tmp_path, "export")
    os.makedirs(out)
    _write_config(out, draft_cfg)
    cfg = _read_cfg(out)
    assert cfg["rope_scaling"]["factor"] == 8.0
    assert cfg["rope_theta"] == 500000.0


# ---------------------------------------------------------------------------
# muP width-multiplier fold
# ---------------------------------------------------------------------------

MUP = 8.0


def _save_mup_llama(tmp_path, tie=False):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=64, tie_word_embeddings=tie,
    )
    torch.manual_seed(3)
    model = LlamaForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    # declare the muP multiplier the way a muP-pretrained target would
    cfg_path = os.path.join(tmp_path, "config.json")
    with open(cfg_path) as f:
        raw = json.load(f)
    raw["logits_mup_width_multiplier"] = MUP
    with open(cfg_path, "w") as f:
        json.dump(raw, f)
    return model


def test_mup_folds_into_loaded_lm_head(tmp_path):
    from specforge_tpu.models.target.transformer import (
        TargetConfig,
        load_target_params,
    )

    model = _save_mup_llama(tmp_path)
    config = TargetConfig.from_file(str(tmp_path))
    assert config.logits_mup_width_multiplier == MUP
    params = load_target_params(str(tmp_path), config, dtype=jnp.float32)
    ref = model.lm_head.weight.detach().numpy()
    np.testing.assert_allclose(
        np.asarray(params["lm_head.weight"]), ref / MUP, rtol=1e-6
    )
    # embedding NOT scaled
    np.testing.assert_allclose(
        np.asarray(params["model.embed_tokens.weight"]),
        model.model.embed_tokens.weight.detach().numpy(), rtol=1e-6,
    )


def test_mup_folds_into_target_head(tmp_path):
    from specforge_tpu.models.target.head import TargetHead

    model = _save_mup_llama(tmp_path)
    head = TargetHead.from_pretrained(str(tmp_path), dtype=jnp.float32)
    ref = model.lm_head.weight.detach().numpy()
    np.testing.assert_allclose(np.asarray(head.weight), ref / MUP, rtol=1e-6)
    # embedding loads through the same loader stay unscaled
    embed = TargetHead.from_pretrained(
        str(tmp_path), lm_head_key="model.embed_tokens.weight",
        dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(embed.weight),
        model.model.embed_tokens.weight.detach().numpy(), rtol=1e-6,
    )


def test_tied_embedding_head_fallback(tmp_path):
    """Tied targets omit lm_head.weight from the shards — the frozen head
    loader falls back to the shared embedding table."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from specforge_tpu.models.target.head import TargetHead

    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        max_position_embeddings=64, tie_word_embeddings=True,
    )
    torch.manual_seed(4)
    model = LlamaForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    head = TargetHead.from_pretrained(str(tmp_path), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(head.weight),
        model.model.embed_tokens.weight.detach().numpy(), rtol=1e-6,
    )


def test_mup_tied_embedding_refused(tmp_path):
    from specforge_tpu.models.target.head import TargetHead
    from specforge_tpu.models.target.transformer import (
        TargetConfig,
        load_target_params,
    )

    _save_mup_llama(tmp_path, tie=True)
    config = TargetConfig.from_file(str(tmp_path))
    with pytest.raises(ValueError, match="tied"):
        load_target_params(str(tmp_path), config)
    with pytest.raises(ValueError, match="tied"):
        TargetHead.from_pretrained(str(tmp_path))


def test_mup_capture_stores_canonical_hidden(tmp_path):
    """The production capture path stores the UNSCALED post-norm hidden and
    folded-head logits equal the HF muP serving logits (multiplier applied
    exactly once)."""
    import torch

    from specforge_tpu.models.target.head import apply_target_head
    from specforge_tpu.models.target.transformer import (
        TargetConfig,
        load_target_params,
        target_capture_forward,
    )

    model = _save_mup_llama(tmp_path)
    config = TargetConfig.from_file(str(tmp_path))
    params = load_target_params(str(tmp_path), config, dtype=jnp.float32)
    ids = np.arange(8, dtype=np.int64)[None] % 64
    mask = np.ones_like(ids)
    _aux, last, _ = target_capture_forward(
        params, config, jnp.asarray(ids), jnp.asarray(mask), [1],
    )
    with torch.no_grad():
        out = model.model(torch.tensor(ids))
        ref_last = out.last_hidden_state.numpy()
        # a muP serving stack computes logits = lm_head(h) / multiplier
        ref_logits = model.lm_head(out.last_hidden_state).numpy() / MUP
    np.testing.assert_allclose(np.asarray(last), ref_last,
                               rtol=2e-4, atol=2e-4)
    logits = apply_target_head(params["lm_head.weight"], last)
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               rtol=2e-4, atol=2e-4)
