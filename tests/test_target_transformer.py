"""Target-model capture forward vs transformers' reference implementations
(tiny random checkpoints saved to disk, loaded through the production
safetensors path)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from specforge_tpu.models.target.transformer import (
    TargetConfig,
    load_target_params,
    target_capture_forward,
)

B, S = 2, 12


def _save_tiny_llama(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    config = LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    return model, config


def _save_tiny_qwen3(tmp_path):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    config = Qwen3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=256, rope_theta=10000.0,
    )
    torch.manual_seed(1)
    model = Qwen3ForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    return model, config


@pytest.mark.parametrize("family", ["llama", "qwen3"])
def test_capture_matches_transformers(tmp_path, family):
    if family == "llama":
        model, _ = _save_tiny_llama(tmp_path)
    else:
        try:
            model, _ = _save_tiny_qwen3(tmp_path)
        except ImportError:
            pytest.skip("Qwen3 not available in installed transformers")

    config = TargetConfig.from_file(str(tmp_path))
    assert config.qk_norm == (family == "qwen3")
    params = load_target_params(str(tmp_path), config, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    input_ids = rng.integers(0, 128, size=(B, S))
    attention_mask = np.ones((B, S), np.int64)
    attention_mask[1, 9:] = 0

    capture_layers = [1, config.num_hidden_layers - 2]
    aux, last, _ = target_capture_forward(
        params, config, jnp.asarray(input_ids), jnp.asarray(attention_mask),
        capture_layers,
    )

    with torch.no_grad():
        out = model.model(
            torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
            output_hidden_states=True,
        )
    # hidden_states[i+1] = output of layer i (capture offset convention)
    ref_aux = torch.cat(
        [out.hidden_states[i + 1] for i in capture_layers], dim=-1
    ).numpy()
    ref_last = out.last_hidden_state.numpy()

    # compare only non-padded positions (padded-query rows differ freely)
    valid = attention_mask.astype(bool)
    np.testing.assert_allclose(
        np.asarray(aux)[valid], ref_aux[valid], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(last)[valid], ref_last[valid], rtol=2e-4, atol=2e-4
    )


def test_tied_embeddings_lm_head(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    config = LlamaConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        tie_word_embeddings=True,
    )
    LlamaForCausalLM(config).save_pretrained(tmp_path, safe_serialization=True)
    tc = TargetConfig.from_file(str(tmp_path))
    params = load_target_params(str(tmp_path), tc, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(params["lm_head.weight"]),
        np.asarray(params["model.embed_tokens.weight"]),
    )


def test_moe_paths_agree_at_scale():
    """dense-scan vs ragged_dot gather-by-expert on a bigger synthetic MoE
    layer (the TPU speedup itself is measured by
    benchmarks/moe_micro.py on hardware — CPU XLA lowers ragged_dot
    densely, so cost analysis is not a valid FLOP proxy here)."""
    from specforge_tpu.models.target.transformer import (
        TargetConfig,
        _moe_mlp_dense,
        _moe_mlp_gathered,
    )

    e, k, h, inter, toks = 16, 2, 64, 128, 256
    cfg = TargetConfig(
        vocab_size=1, hidden_size=h, intermediate_size=inter,
        num_hidden_layers=1, num_attention_heads=1, num_key_value_heads=1,
        num_experts=e, num_experts_per_tok=k, moe_intermediate_size=inter,
        norm_topk_prob=True,
    )
    rng = np.random.default_rng(0)
    params = {"L.mlp.gate.weight": jnp.asarray(
        rng.normal(size=(e, h)).astype(np.float32))}
    for i in range(e):
        params[f"L.mlp.experts.{i}.gate_proj.weight"] = jnp.asarray(
            rng.normal(size=(inter, h)).astype(np.float32))
        params[f"L.mlp.experts.{i}.up_proj.weight"] = jnp.asarray(
            rng.normal(size=(inter, h)).astype(np.float32))
        params[f"L.mlp.experts.{i}.down_proj.weight"] = jnp.asarray(
            rng.normal(size=(h, inter)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, toks, h)).astype(np.float32))
    out_dense = _moe_mlp_dense(params, cfg, "L", y)
    out_gathered = _moe_mlp_gathered(params, cfg, "L", y)
    np.testing.assert_allclose(
        np.asarray(out_gathered), np.asarray(out_dense), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("moe_impl", ["dense", "gathered"])
def test_qwen3_moe_capture_matches_transformers(tmp_path, monkeypatch,
                                                moe_impl):
    """Both MoE paths match HF: the lax.scan dense reference and the
    ragged_dot gather-by-expert fast path (FLOPs ∝ top-k)."""
    monkeypatch.setenv("SPECFORGE_MOE_IMPL", moe_impl)
    try:
        from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    except ImportError:
        pytest.skip("Qwen3Moe not in installed transformers")

    config = Qwen3MoeConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=24, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=True, max_position_embeddings=256,
    )
    torch.manual_seed(2)
    model = Qwen3MoeForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    tc = TargetConfig.from_file(str(tmp_path))
    assert tc.num_experts == 4 and tc.is_moe_layer(0)
    params = load_target_params(str(tmp_path), tc, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, size=(2, 10))
    # capture non-final layers: HF's hidden_states[-1] is post-final-norm in
    # current transformers, and real capture layers never include the last
    # layer (reference: [1, n//2-1, n-4])
    aux, last, _ = target_capture_forward(
        params, tc, jnp.asarray(ids), None, (0, 1),
    )
    with torch.no_grad():
        out = model.model(torch.tensor(ids), output_hidden_states=True)
    ref_aux = torch.cat(
        [out.hidden_states[i + 1] for i in (0, 1)], dim=-1
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(aux), ref_aux, rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(last), out.last_hidden_state.numpy(), rtol=5e-4, atol=5e-4
    )
