"""RoPE parity vs independently-written torch implementations of the
HF-style rotary variants the reference uses (llama3_eagle.py:218-537)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from specforge_tpu.ops.rope import (
    RopeSpec,
    apply_rope,
    inv_freq_and_scale,
    rope_cos_sin,
    rotate_half,
)

D = 16


def torch_cos_sin(inv_freq, positions, scale=1.0):
    t = torch.as_tensor(positions, dtype=torch.float32)
    freqs = torch.einsum("...s,j->...sj", t, torch.as_tensor(inv_freq).float())
    emb = torch.cat((freqs, freqs), dim=-1)
    return emb.cos() * scale, emb.sin() * scale


def torch_rotate_half(x):
    x1 = x[..., : x.shape[-1] // 2]
    x2 = x[..., x.shape[-1] // 2:]
    return torch.cat((-x2, x1), dim=-1)


def test_default_rope_matches_torch():
    spec = RopeSpec(head_dim=D, base=10000.0, max_position_embeddings=128)
    pos = np.arange(24)[None].repeat(2, 0)
    cos, sin = rope_cos_sin(spec, jnp.asarray(pos), seq_len=24)
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    rcos, rsin = torch_cos_sin(inv_freq, pos)
    np.testing.assert_allclose(np.asarray(cos), rcos.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), rsin.numpy(), rtol=1e-5, atol=1e-6)


def test_linear_scaling_divides_positions():
    spec = RopeSpec(head_dim=D, scaling_type="linear", scaling_factor=4.0)
    pos = np.arange(16)[None]
    cos, _ = rope_cos_sin(spec, jnp.asarray(pos), seq_len=16)
    base = RopeSpec(head_dim=D)
    cos_base, _ = rope_cos_sin(base, jnp.asarray(pos / 4.0), seq_len=16)
    np.testing.assert_allclose(np.asarray(cos), np.asarray(cos_base), rtol=1e-5)


def test_dynamic_ntk_rescales_base_beyond_max():
    spec = RopeSpec(
        head_dim=D, scaling_type="dynamic", scaling_factor=2.0,
        max_position_embeddings=32,
    )
    inv_short, _ = inv_freq_and_scale(spec, seq_len=16)
    inv_long, _ = inv_freq_and_scale(spec, seq_len=64)
    base_inv = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    np.testing.assert_allclose(inv_short, base_inv.astype(np.float32), rtol=1e-6)
    expected_base = 10000.0 * ((2.0 * 64 / 32) - 1.0) ** (D / (D - 2))
    expected = 1.0 / (expected_base ** (np.arange(0, D, 2) / D))
    np.testing.assert_allclose(inv_long, expected.astype(np.float32), rtol=1e-6)


def test_llama3_banded_scaling():
    spec = RopeSpec(
        head_dim=D, scaling_type="llama3", scaling_factor=8.0,
        low_freq_factor=1.0, high_freq_factor=4.0,
        original_max_position_embeddings=8192,
    )
    inv, _ = inv_freq_and_scale(spec, seq_len=128)
    base_inv = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    wave_len = 2 * math.pi / base_inv
    low_wl, high_wl = 8192 / 1.0, 8192 / 4.0
    for i in range(D // 2):
        if wave_len[i] < high_wl:
            assert np.isclose(inv[i], base_inv[i], rtol=1e-6)
        elif wave_len[i] > low_wl:
            assert np.isclose(inv[i], base_inv[i] / 8.0, rtol=1e-6)
        else:
            smooth = (8192 / wave_len[i] - 1.0) / (4.0 - 1.0)
            expected = (1 - smooth) * base_inv[i] / 8.0 + smooth * base_inv[i]
            assert np.isclose(inv[i], expected, rtol=1e-6)


def test_yarn_mscale_and_ramp():
    spec = RopeSpec(
        head_dim=D, scaling_type="yarn", scaling_factor=4.0,
        original_max_position_embeddings=4096, beta_fast=32.0, beta_slow=1.0,
        mscale=1.0, mscale_all_dim=0.0,
    )
    inv, scale = inv_freq_and_scale(spec, seq_len=64)
    assert scale == pytest.approx(0.1 * math.log(4.0) + 1.0)
    base_inv = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    assert np.all(inv <= base_inv * (1 + 1e-6))
    assert np.all(inv >= base_inv / 4.0 * (1 - 1e-6))


def test_apply_rope_matches_torch():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(2, 4, 8, D)).astype(np.float32)
    k = rng.normal(size=(2, 2, 8, D)).astype(np.float32)
    pos = np.arange(8)[None].repeat(2, 0) + 3
    spec = RopeSpec(head_dim=D)
    cos, sin = rope_cos_sin(spec, jnp.asarray(pos), seq_len=11)
    qe, ke = apply_rope(jnp.asarray(q), jnp.asarray(k), cos, sin)

    inv_freq = 1.0 / (10000.0 ** (np.arange(0, D, 2) / D))
    rcos, rsin = torch_cos_sin(inv_freq, pos)
    rcos, rsin = rcos[:, None], rsin[:, None]
    tq, tk = torch.tensor(q), torch.tensor(k)
    rq = tq * rcos + torch_rotate_half(tq) * rsin
    rk = tk * rcos + torch_rotate_half(tk) * rsin
    np.testing.assert_allclose(np.asarray(qe), rq.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ke), rk.numpy(), rtol=1e-5, atol=1e-6)


def test_multimodal_rope_sections():
    from specforge_tpu.ops.rope import apply_multimodal_rope

    rng = np.random.default_rng(2)
    B, H, S = 1, 2, 6
    sections = (2, 3, 3)  # sums to D/2 = 8
    q = rng.normal(size=(B, H, S, D)).astype(np.float32)
    k = rng.normal(size=(B, H, S, D)).astype(np.float32)
    # three independent position axes (temporal/height/width)
    pos3 = np.stack([np.arange(S), np.arange(S) * 2, np.arange(S) * 3])[
        :, None, :
    ].repeat(B, 1)
    spec = RopeSpec(head_dim=D, scaling_type="mrope",
                    mrope_section=sections)
    cos, sin = rope_cos_sin(spec, jnp.asarray(pos3), seq_len=S * 3)
    qe, ke = apply_multimodal_rope(
        jnp.asarray(q), jnp.asarray(k), cos, sin, sections
    )
    assert qe.shape == q.shape and ke.shape == k.shape

    # when all three axes carry the SAME positions, mrope must equal plain rope
    pos1 = np.arange(S)[None].repeat(B, 0)
    pos_same = np.stack([pos1, pos1, pos1])
    cos_s, sin_s = rope_cos_sin(spec, jnp.asarray(pos_same), seq_len=S)
    qe_same, ke_same = apply_multimodal_rope(
        jnp.asarray(q), jnp.asarray(k), cos_s, sin_s, sections
    )
    plain = RopeSpec(head_dim=D)
    cos_p, sin_p = rope_cos_sin(plain, jnp.asarray(pos1), seq_len=S)
    from specforge_tpu.ops.rope import apply_rope as _apply
    qe_p, ke_p = _apply(jnp.asarray(q), jnp.asarray(k), cos_p, sin_p)
    np.testing.assert_allclose(np.asarray(qe_same), np.asarray(qe_p),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ke_same), np.asarray(ke_p),
                               rtol=1e-5, atol=1e-6)
