"""Expert-parallel MoE capture: parity vs the gathered path on an 8-device
mesh, capacity-overflow detection, and the capture-runner EP wiring.

The EP path is the TPU-native answer to the reference's capture-server EP
knobs (sglang_ep_size, ref specforge/config/schema.py:863-876): expert
tables stay sharded over the mesh (no all-gather) and MoE outputs psum.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from specforge_tpu.models.target.transformer import (
    TargetConfig,
    _moe_mlp_ep,
    _moe_mlp_gathered,
    stack_moe_expert_params,
    target_capture_forward,
)
from specforge_tpu.parallel.mesh import MeshConfig, build_mesh


def _moe_cfg(e=8, k=2, h=32, inter=48):
    return TargetConfig(
        vocab_size=1, hidden_size=h, intermediate_size=inter,
        num_hidden_layers=1, num_attention_heads=1, num_key_value_heads=1,
        num_experts=e, num_experts_per_tok=k, moe_intermediate_size=inter,
        norm_topk_prob=True,
    )


def _moe_params(cfg, rng, prefix="model.layers.0"):
    e, h = cfg.num_experts, cfg.hidden_size
    inter = cfg.moe_intermediate_size
    params = {
        f"{prefix}.mlp.gate.weight": jnp.asarray(
            rng.normal(size=(e, h)).astype(np.float32)
        )
    }
    for i in range(e):
        for name, shape in (
            ("gate_proj", (inter, h)),
            ("up_proj", (inter, h)),
            ("down_proj", (h, inter)),
        ):
            params[f"{prefix}.mlp.experts.{i}.{name}.weight"] = jnp.asarray(
                rng.normal(size=shape).astype(np.float32) * 0.1
            )
    return params


@pytest.mark.parametrize("e,fsdp", [(8, 8), (16, 8), (8, 4)])
def test_ep_matches_gathered_full_capacity(e, fsdp):
    cfg = _moe_cfg(e=e)
    rng = np.random.default_rng(0)
    params = _moe_params(cfg, rng)
    y = jnp.asarray(rng.normal(size=(2, 24, cfg.hidden_size)).astype(np.float32))

    ref = _moe_mlp_gathered(params, cfg, "model.layers.0", y)

    mc = MeshConfig(fsdp=fsdp, dp=8 // fsdp)
    mesh = build_mesh(mc, devices=jax.devices()[:8])
    stacked = stack_moe_expert_params(params, cfg, mesh)
    out, overflow = jax.jit(
        lambda p, yv: _moe_mlp_ep(p, cfg, "model.layers.0", yv, mesh)
    )(stacked, y)
    assert int(overflow) == 0
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_ep_bounded_capacity_balanced_routing():
    cfg = _moe_cfg(e=8)
    rng = np.random.default_rng(1)
    params = _moe_params(cfg, rng)
    y = jnp.asarray(rng.normal(size=(2, 64, cfg.hidden_size)).astype(np.float32))
    ref = _moe_mlp_gathered(params, cfg, "model.layers.0", y)
    mesh = build_mesh(MeshConfig(fsdp=8), devices=jax.devices()[:8])
    stacked = stack_moe_expert_params(params, cfg, mesh)
    out, overflow = jax.jit(
        lambda p, yv: _moe_mlp_ep(
            p, cfg, "model.layers.0", yv, mesh, capacity_factor=2.0
        )
    )(stacked, y)
    assert int(overflow) == 0
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_ep_overflow_detected_on_skewed_routing():
    cfg = _moe_cfg(e=8)
    rng = np.random.default_rng(2)
    params = _moe_params(cfg, rng)
    # router sends every token to expert 0 (others tie at logit 0): the
    # owning shard's load is t rows >> capacity at cf=1
    gate = np.zeros((8, cfg.hidden_size), np.float32)
    gate[0] = 10.0
    params["model.layers.0.mlp.gate.weight"] = jnp.asarray(gate)
    y = jnp.abs(
        jnp.asarray(rng.normal(size=(2, 64, cfg.hidden_size)).astype(np.float32))
    )
    mesh = build_mesh(MeshConfig(fsdp=8), devices=jax.devices()[:8])
    stacked = stack_moe_expert_params(params, cfg, mesh)
    _, overflow = jax.jit(
        lambda p, yv: _moe_mlp_ep(
            p, cfg, "model.layers.0", yv, mesh, capacity_factor=1.0
        )
    )(stacked, y)
    assert int(overflow) > 0


def test_ep_capture_forward_matches_default(tmp_path):
    """Full capture forward with moe_impl='ep' vs the default gathered path
    through the production safetensors load."""
    try:
        from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    except ImportError:
        pytest.skip("Qwen3Moe not in installed transformers")
    import torch

    from specforge_tpu.models.target.transformer import load_target_params

    config = Qwen3MoeConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=24, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_experts=8, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=True, max_position_embeddings=256,
    )
    torch.manual_seed(3)
    Qwen3MoeForCausalLM(config).eval().save_pretrained(
        tmp_path, safe_serialization=True
    )
    tc = TargetConfig.from_file(str(tmp_path))
    params = load_target_params(str(tmp_path), tc, dtype=jnp.float32)
    ids = np.random.default_rng(0).integers(0, 96, size=(2, 10))

    ref_aux, ref_last, _ = target_capture_forward(
        params, tc, jnp.asarray(ids), None, (0,)
    )
    mesh = build_mesh(MeshConfig(fsdp=8), devices=jax.devices()[:8])
    stacked = stack_moe_expert_params(params, tc, mesh)
    aux, last, overflow = jax.jit(
        lambda p, i: target_capture_forward(
            p, tc, i, None, (0,), moe_impl="ep", moe_mesh=mesh
        )
    )(stacked, jnp.asarray(ids))
    assert int(overflow) == 0
    np.testing.assert_allclose(
        np.asarray(aux), np.asarray(ref_aux), rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(last), np.asarray(ref_last), rtol=5e-4, atol=5e-4
    )


def test_ep_padding_consumes_no_capacity():
    """A mostly-padded batch must not overflow a bounded capacity: padding
    tokens (token_valid=0) join no expert group. Valid-position outputs
    still match the gathered reference."""
    cfg = _moe_cfg(e=8)
    rng = np.random.default_rng(3)
    params = _moe_params(cfg, rng)
    b, s = 4, 32
    y = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)).astype(np.float32))
    valid = np.zeros((b, s), np.int32)
    valid[0, :8] = 1  # one real sample, 3 fully-padded rows
    ref = _moe_mlp_gathered(params, cfg, "model.layers.0", y)
    mesh = build_mesh(MeshConfig(fsdp=8), devices=jax.devices()[:8])
    stacked = stack_moe_expert_params(params, cfg, mesh)
    out, overflow = jax.jit(
        lambda p, yv, v: _moe_mlp_ep(
            p, cfg, "model.layers.0", yv, mesh, capacity_factor=2.0,
            token_valid=v,
        )
    )(stacked, y, jnp.asarray(valid))
    # bounded capacity is sized for 8 real tokens x k=2 over 8 shards; if
    # padding consumed capacity (120 pad tokens all routing identically)
    # this would overflow
    assert int(overflow) == 0
    np.testing.assert_allclose(
        np.asarray(out)[0, :8], np.asarray(ref)[0, :8], rtol=2e-4, atol=2e-4
    )
    # padded positions produce exactly zero (no group membership)
    assert np.all(np.asarray(out)[1:] == 0.0)


def test_ep_runner_rejects_bad_config(tmp_path):
    from specforge_tpu.offline_capture.capture import (
        OfflineCaptureConfig,
        OfflineCaptureRunner,
    )

    cfg = OfflineCaptureConfig(
        target_model_path=str(tmp_path), output_dir=str(tmp_path),
        capture_layers=(0,),
    )
    with pytest.raises(ValueError, match="requires a device mesh"):
        OfflineCaptureRunner(
            cfg,
            target_config=_moe_cfg(),
            target_params={},
            moe_impl="ep",
        )


# -- deepseek / gptoss EP variants (reference sglang_ep_size covers every
# MoE target, ref specforge/config/schema.py:93-98) ------------------------

def _deepseek_cfg(e=8, k=2, h=32, inter=48):
    return TargetConfig(
        vocab_size=1, hidden_size=h, intermediate_size=inter,
        num_hidden_layers=1, num_attention_heads=1, num_key_value_heads=1,
        num_experts=e, num_experts_per_tok=k, moe_intermediate_size=inter,
        moe_variant="deepseek", scoring_func="sigmoid",
        topk_method="noaux_tc", n_group=4, topk_group=2,
        norm_topk_prob=True, routed_scaling_factor=2.5, n_shared_experts=1,
    )


def _deepseek_params(cfg, rng, prefix="model.layers.0"):
    params = _moe_params(cfg, rng, prefix)
    e, h = cfg.num_experts, cfg.hidden_size
    inter = cfg.moe_intermediate_size
    params[f"{prefix}.mlp.gate.e_score_correction_bias"] = jnp.asarray(
        rng.normal(size=(e,)).astype(np.float32) * 0.2
    )
    # shared experts (always-on dense)
    for name, shape in (("gate_proj", (inter, h)), ("up_proj", (inter, h)),
                        ("down_proj", (h, inter))):
        params[f"{prefix}.mlp.shared_experts.{name}.weight"] = jnp.asarray(
            rng.normal(size=shape).astype(np.float32) * 0.1
        )
    return params


def _gptoss_cfg(e=8, k=2, h=32, inter=48):
    return TargetConfig(
        vocab_size=1, hidden_size=h, intermediate_size=inter,
        num_hidden_layers=1, num_attention_heads=1, num_key_value_heads=1,
        num_experts=e, num_experts_per_tok=k, moe_intermediate_size=inter,
        moe_variant="gptoss", hidden_act="silu",
    )


def _gptoss_params(cfg, rng, prefix="model.layers.0"):
    e, h = cfg.num_experts, cfg.hidden_size
    inter = cfg.moe_intermediate_size
    f32 = np.float32
    return {
        f"{prefix}.mlp.router.weight": jnp.asarray(
            rng.normal(size=(e, h)).astype(f32)),
        f"{prefix}.mlp.router.bias": jnp.asarray(
            rng.normal(size=(e,)).astype(f32) * 0.1),
        f"{prefix}.mlp.experts.gate_up_proj": jnp.asarray(
            rng.normal(size=(e, h, 2 * inter)).astype(f32) * 0.1),
        f"{prefix}.mlp.experts.gate_up_proj_bias": jnp.asarray(
            rng.normal(size=(e, 2 * inter)).astype(f32) * 0.1),
        f"{prefix}.mlp.experts.down_proj": jnp.asarray(
            rng.normal(size=(e, inter, h)).astype(f32) * 0.1),
        f"{prefix}.mlp.experts.down_proj_bias": jnp.asarray(
            rng.normal(size=(e, h)).astype(f32) * 0.1),
    }


def test_ep_deepseek_matches_dense_variant():
    """EP routed output + replicated shared experts == the deepseek
    gathered reference path (grouped sigmoid router, noaux_tc group
    selection, correction bias, routed scaling, shared experts)."""
    from specforge_tpu.models.target.transformer import _moe_deepseek

    cfg = _deepseek_cfg()
    rng = np.random.default_rng(5)
    params = _deepseek_params(cfg, rng)
    y = jnp.asarray(
        rng.normal(size=(2, 24, cfg.hidden_size)).astype(np.float32)
    )
    ref = _moe_deepseek(params, cfg, "model.layers.0", y)

    mesh = build_mesh(MeshConfig(fsdp=8), devices=jax.devices()[:8])
    stacked = stack_moe_expert_params(params, cfg, mesh)
    out, overflow = jax.jit(
        lambda p, yv: _moe_mlp_ep(p, cfg, "model.layers.0", yv, mesh)
    )(stacked, y)
    assert int(overflow) == 0
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_ep_gptoss_matches_dense_variant():
    """EP == the gpt-oss gathered reference path (biased router, fused
    interleaved gate_up with per-expert biases, clamp-swiglu)."""
    from specforge_tpu.models.target.transformer import _moe_gptoss

    cfg = _gptoss_cfg()
    rng = np.random.default_rng(6)
    params = _gptoss_params(cfg, rng)
    y = jnp.asarray(
        rng.normal(size=(2, 24, cfg.hidden_size)).astype(np.float32)
    )
    ref = _moe_gptoss(params, cfg, "model.layers.0", y)

    mesh = build_mesh(MeshConfig(fsdp=8), devices=jax.devices()[:8])
    stacked = stack_moe_expert_params(params, cfg, mesh)
    out, overflow = jax.jit(
        lambda p, yv: _moe_mlp_ep(p, cfg, "model.layers.0", yv, mesh)
    )(stacked, y)
    assert int(overflow) == 0
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_ep_deepseek_bounded_capacity_overflow_detected():
    """Capacity accounting stays exact for the deepseek router: skewed
    routing under a tight capacity_factor must report overflow > 0."""
    cfg = _deepseek_cfg()
    rng = np.random.default_rng(7)
    params = _deepseek_params(cfg, rng)
    # bias all tokens toward one expert group by inflating its router row
    gate = np.array(params["model.layers.0.mlp.gate.weight"])
    gate[0] += 10.0
    params["model.layers.0.mlp.gate.weight"] = jnp.asarray(gate)
    y = jnp.asarray(
        rng.normal(size=(2, 64, cfg.hidden_size)).astype(np.float32)
    )
    mesh = build_mesh(MeshConfig(fsdp=8), devices=jax.devices()[:8])
    stacked = stack_moe_expert_params(params, cfg, mesh)
    _, overflow = jax.jit(
        lambda p, yv: _moe_mlp_ep(
            p, cfg, "model.layers.0", yv, mesh, capacity_factor=1.0
        )
    )(stacked, y)
    assert int(overflow) > 0
