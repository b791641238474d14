"""Target capture forward vs transformers for the round-3 architecture
families: gemma3 (sandwich norms, dual-theta sliding layers, gemma RMSNorm),
phi3/phi4 (fused qkv + gate_up), gpt-oss (attention sinks, sliding layers,
clamp-swiglu fused-expert MoE, biased router), deepseek v2-lite / v3 / kimi
(MLA + shared-expert MoE, grouped routing), glm4_moe (partial rotary +
sigmoid noaux router).

Same oracle pattern as tests/test_target_transformer.py: tiny random HF
checkpoints saved to disk, loaded through the production safetensors path,
full-precision comparison of captured hidden states. Reference gets these
architectures for free by capturing inside SGLang
(/root/reference/specforge/offline_capture/sglang.py:22); here the capture
forward must implement each family.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from specforge_tpu.models.target.transformer import (
    TargetConfig,
    load_target_params,
    target_capture_forward,
)

B, S = 2, 12
TOL = dict(rtol=5e-4, atol=5e-4)


def _compare(tmp_path, model, capture_layers, attention_mask=None, **tol):
    tol = tol or TOL
    config = TargetConfig.from_file(str(tmp_path))
    params = load_target_params(str(tmp_path), config, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, model.config.vocab_size - 1, size=(B, S))
    mask_t = None
    if attention_mask is not None:
        mask_t = torch.tensor(attention_mask)
    aux, last, _ = target_capture_forward(
        params, config, jnp.asarray(ids),
        jnp.asarray(attention_mask) if attention_mask is not None else None,
        capture_layers,
    )
    with torch.no_grad():
        out = model.model(
            torch.tensor(ids), attention_mask=mask_t,
            output_hidden_states=True,
        )
    ref_aux = torch.cat(
        [out.hidden_states[i + 1] for i in capture_layers], dim=-1
    ).numpy()
    ref_last = out.last_hidden_state.numpy()
    valid = (
        attention_mask.astype(bool)
        if attention_mask is not None
        else np.ones((B, S), bool)
    )
    np.testing.assert_allclose(np.asarray(aux)[valid], ref_aux[valid], **tol)
    np.testing.assert_allclose(np.asarray(last)[valid], ref_last[valid], **tol)
    return config


def test_gemma3_capture_matches_transformers(tmp_path):
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    config = Gemma3TextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=7, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, sliding_window=4,
        query_pre_attn_scalar=8, rope_local_base_freq=10000.0,
        rope_theta=1000000.0,
    )
    torch.manual_seed(3)
    model = Gemma3ForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    mask = np.ones((B, S), np.int64)
    mask[1, 9:] = 0
    tc = _compare(tmp_path, model, [1, 5], attention_mask=mask)
    assert tc.norm_style == "gemma" and tc.sandwich_norms
    # layer_types must mix sliding and full for the test to mean anything
    assert "sliding_attention" in tc.layer_types
    assert "full_attention" in tc.layer_types


def test_phi3_capture_matches_transformers(tmp_path):
    from transformers import Phi3Config, Phi3ForCausalLM

    config = Phi3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, pad_token_id=0,
    )
    torch.manual_seed(4)
    model = Phi3ForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    mask = np.ones((B, S), np.int64)
    mask[0, 10:] = 0
    _compare(tmp_path, model, [0, 1], attention_mask=mask)


def test_gpt_oss_capture_matches_transformers(tmp_path):
    from transformers import GptOssConfig, GptOssForCausalLM

    config = GptOssConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, sliding_window=4,
        num_local_experts=4, num_experts_per_tok=2,
    )
    torch.manual_seed(5)
    model = GptOssForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    tc = _compare(tmp_path, model, [1, 2])
    assert tc.attention_sinks and tc.moe_variant == "gptoss"
    assert tc.is_moe_layer(0) and tc.is_moe_layer(3)
    assert "sliding_attention" in tc.layer_types


def test_deepseek_v2_lite_capture_matches_transformers(tmp_path):
    """v2-lite shape: no q LoRA, greedy routing, shared experts."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    config = DeepseekV2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=16, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=None, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=8, v_head_dim=8,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, topk_method="greedy", n_group=1,
        topk_group=1, routed_scaling_factor=1.0,
        max_position_embeddings=128,
    )
    torch.manual_seed(6)
    model = DeepseekV2ForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    tc = _compare(tmp_path, model, [0, 1])
    assert tc.attn_variant == "mla" and tc.q_lora_rank is None
    assert not tc.is_moe_layer(0) and tc.is_moe_layer(1)


def test_deepseek_v2_group_limited_routing(tmp_path):
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    config = DeepseekV2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=16, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=16, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=8, v_head_dim=8,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=2,
        first_k_dense_replace=0, topk_method="group_limited_greedy",
        n_group=4, topk_group=2, routed_scaling_factor=1.5,
        max_position_embeddings=128,
    )
    torch.manual_seed(7)
    model = DeepseekV2ForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    _compare(tmp_path, model, [0])


def test_deepseek_v3_capture_matches_transformers(tmp_path):
    """v3 shape: q LoRA, sigmoid scores + noaux_tc grouped routing."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    config = DeepseekV3Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=16, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=16, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=8, v_head_dim=8,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, n_group=2, topk_group=1,
        routed_scaling_factor=2.5, norm_topk_prob=True,
        max_position_embeddings=128,
    )
    torch.manual_seed(8)
    model = DeepseekV3ForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    tc = _compare(tmp_path, model, [1])
    assert tc.scoring_func == "sigmoid" and tc.topk_method == "noaux_tc"


def test_glm4_moe_capture_matches_transformers(tmp_path):
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    config = Glm4MoeConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=16, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        partial_rotary_factor=0.5, use_qk_norm=True,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, n_group=1, topk_group=1,
        routed_scaling_factor=1.0, norm_topk_prob=True,
        max_position_embeddings=128,
    )
    torch.manual_seed(9)
    model = Glm4MoeForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    tc = _compare(tmp_path, model, [0, 1])
    assert tc.partial_rotary_factor == 0.5 and tc.qk_norm


def test_llama4_capture_matches_transformers(tmp_path):
    """llama4 text: NoPE layers with temperature tuning, chunked attention
    on rope layers, L2 qk norm after rope, input-scaled fused experts with
    an always-on shared expert, dense layers sized intermediate_size_mlp."""
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    config = Llama4TextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=48,
        intermediate_size_mlp=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=128, num_local_experts=4,
        num_experts_per_tok=1, interleave_moe_layer_step=2,
        no_rope_layer_interval=2, attention_chunk_size=4,
        use_qk_norm=True, attn_temperature_tuning=True,
        floor_scale=4.0, attn_scale=0.1, pad_token_id=0,
    )
    torch.manual_seed(10)
    model = Llama4ForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    mask = np.ones((B, S), np.int64)
    mask[1, 8:] = 0
    tc = _compare(tmp_path, model, [0, 2], attention_mask=mask)
    assert tc.moe_variant == "llama4" and tc.qk_l2_norm
    assert tc.attn_temperature_tuning
    # the config must mix nope/full and rope/chunked layers, and
    # dense/moe layers, for this test to exercise every llama4 branch
    assert tc.no_rope_layers == (1, 0, 1, 0)
    assert "chunked_attention" in tc.layer_types
    assert "full_attention" in tc.layer_types
    assert not tc.is_moe_layer(0) and tc.is_moe_layer(1)
    assert S > tc.attention_chunk_size


def test_qwen3_next_capture_matches_transformers(tmp_path):
    """qwen3_next hybrid: gated-deltanet linear-attention layers (fused
    qkvz/ba projections, causal depthwise conv, chunked gated delta rule,
    gated RMS norm), gated full-attention layers (q_proj carries a sigmoid
    output gate, partial rotary 0.25), MoE with a sigmoid-gated shared
    expert on every layer."""
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    config = Qwen3NextConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=16, shared_expert_intermediate_size=24,
        num_hidden_layers=4, full_attention_interval=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=8, linear_value_head_dim=8,
        linear_conv_kernel_dim=4, num_experts=4, num_experts_per_tok=2,
        decoder_sparse_step=1, norm_topk_prob=True,
        partial_rotary_factor=0.25, max_position_embeddings=128,
        pad_token_id=0,
    )
    torch.manual_seed(11)
    model = Qwen3NextForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    mask = np.ones((B, S), np.int64)
    mask[1, 9:] = 0
    tc = _compare(tmp_path, model, [0, 2], attention_mask=mask)
    assert tc.attn_output_gate and tc.shared_expert_gated
    assert "linear_attention" in tc.layer_types
    assert "full_attention" in tc.layer_types
    assert tc.partial_rotary_factor == 0.25


def test_chunk_gated_delta_rule_chunk_invariant():
    """The chunked delta rule is exact for any chunk size: chunk 4 (multi-
    chunk scan + in-chunk solve) must match chunk 64 (single chunk) on the
    same tensors — exercises the cross-chunk recurrence path that a short
    parity test alone would leave cold."""
    from specforge_tpu.models.target.transformer import (
        _chunk_gated_delta_rule,
    )

    rng = np.random.default_rng(5)
    b, s, h, dk, dv = 2, 13, 3, 8, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, dk)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, s, h, dk)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, s, h, dv)), jnp.float32)
    g = jnp.asarray(-np.abs(rng.normal(size=(b, s, h))), jnp.float32)
    beta = jnp.asarray(
        1.0 / (1.0 + np.exp(-rng.normal(size=(b, s, h)))), jnp.float32
    )
    small = _chunk_gated_delta_rule(q, k, v, g, beta, chunk_size=4)
    big = _chunk_gated_delta_rule(q, k, v, g, beta, chunk_size=64)
    np.testing.assert_allclose(
        np.asarray(small), np.asarray(big), rtol=2e-5, atol=2e-5
    )


def test_longcat_flash_capture_matches_transformers(tmp_path):
    """longcat_flash: dual-sublayer logical layers (2×MLA with LoRA
    rescaling + 2×dense MLP + shortcut MoE), zero-computation identity
    experts, correction-biased router choice."""
    from transformers import LongcatFlashConfig, LongcatFlashForCausalLM

    config = LongcatFlashConfig(
        vocab_size=128, hidden_size=32, ffn_hidden_size=64,
        expert_ffn_hidden_size=16, num_layers=3, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=16, kv_lora_rank=16, qk_nope_head_dim=8,
        qk_rope_head_dim=8, v_head_dim=8, head_dim=8, n_routed_experts=4,
        zero_expert_num=2, moe_topk=2, routed_scaling_factor=1.0,
        max_position_embeddings=128, pad_token_id=0,
    )
    torch.manual_seed(12)
    model = LongcatFlashForCausalLM(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)
    mask = np.ones((B, S), np.int64)
    mask[0, 10:] = 0
    tc = _compare(tmp_path, model, [0, 1], attention_mask=mask)
    assert tc.dual_sublayer and tc.mla_lora_scaling
    assert tc.attn_variant == "mla" and tc.zero_expert_num == 2


def test_qwen2_5_vl_text_capture_matches_transformers(tmp_path):
    """qwen2.5-vl composite checkpoint: the capture forward runs the text
    tower (model.language_model.* keys remapped, vision tower skipped)
    with the 3-axis multimodal rope — nontrivial [3, B, S] position ids
    must match HF's apply_multimodal_rotary_pos_emb, and plain 2D ids must
    degenerate to text rope."""
    from transformers import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration,
    )

    config = Qwen2_5_VLConfig(
        text_config=dict(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]},
        ),
        vision_config=dict(
            depth=2, hidden_size=32, out_hidden_size=32, intermediate_size=32,
            num_heads=4, patch_size=4, spatial_merge_size=1,
            temporal_patch_size=1,
        ),
    )
    torch.manual_seed(13)
    model = Qwen2_5_VLForConditionalGeneration(config).eval()
    model.save_pretrained(tmp_path, safe_serialization=True)

    tc = TargetConfig.from_file(str(tmp_path))
    assert tc.model_type == "qwen2_5_vl_text"
    assert tc.mrope_section == (1, 1, 2)
    params = load_target_params(str(tmp_path), tc, dtype=jnp.float32)
    assert not any("visual" in k for k in params)
    assert "model.layers.0.self_attn.q_proj.weight" in params

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 127, size=(B, S))
    # nontrivial 3-axis positions (as if a vision span occupied 4:8)
    pos = np.broadcast_to(np.arange(S), (3, B, S)).copy()
    pos[1, :, 4:8] += 3
    pos[2, :, 4:8] += 5

    aux, last, _ = target_capture_forward(
        params, tc, jnp.asarray(ids), None, [0, 1],
        position_ids=jnp.asarray(pos),
    )
    with torch.no_grad():
        out = model.model.language_model(
            torch.tensor(ids), position_ids=torch.tensor(pos),
            output_hidden_states=True,
        )
    ref_aux = torch.cat(
        [out.hidden_states[i + 1] for i in (0, 1)], dim=-1
    ).numpy()
    np.testing.assert_allclose(np.asarray(aux), ref_aux, **TOL)
    np.testing.assert_allclose(
        np.asarray(last), out.last_hidden_state.numpy(), **TOL
    )

    # 2D ids broadcast to three identical axes == explicit arange
    aux2, _, _ = target_capture_forward(
        params, tc, jnp.asarray(ids), None, [0, 1],
    )
    aux3, _, _ = target_capture_forward(
        params, tc, jnp.asarray(ids), None, [0, 1],
        position_ids=jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None], (B, S)
        ),
    )
    np.testing.assert_allclose(np.asarray(aux2), np.asarray(aux3), rtol=0)


def test_unsupported_model_type_fails_fast(tmp_path):
    import json
    import os

    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump({
            "model_type": "bailing_moe", "vocab_size": 8,
            "hidden_size": 8, "intermediate_size": 8,
            "num_hidden_layers": 1, "num_attention_heads": 1,
        }, f)
    with pytest.raises(ValueError, match="bailing_moe"):
        TargetConfig.from_file(str(tmp_path))
