"""TTT branch attention vs a torch mirror of the reference branch-cache merge
(llama3_eagle.py:717-778): causal block over branch-0 K/V plus one diagonal
logit per later branch, one joint softmax."""

import jax.numpy as jnp
import numpy as np
import torch

from specforge_tpu.ops.attention import (
    make_causal_bias,
    masked_attention,
    ttt_branch_attention_reference,
)

B, H, KVH, S, D = 2, 4, 2, 10, 8


def torch_branch_attention(q, keys, values, bias):
    """fp32 torch mirror; keys/values already GQA-repeated to H heads."""
    scale = 1.0 / np.sqrt(D)
    k0, v0 = keys[0], values[0]
    w = torch.matmul(q, k0.transpose(2, 3)) * scale + bias
    for ki in keys[1:]:
        wi = (q * ki).sum(-1) * scale
        w = torch.cat((w, wi[..., None]), dim=-1)
    p = torch.nn.functional.softmax(w, dim=-1)
    out = torch.matmul(p[..., :S], v0)
    for i, vi in enumerate(values[1:]):
        out = out + p[..., S + i, None] * vi
    return out.transpose(1, 2).reshape(B, S, H * D)


def _case(n_branches, with_padding=False, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, H, S, D)).astype(np.float32)
    keys = [rng.normal(size=(B, KVH, S, D)).astype(np.float32)
            for _ in range(n_branches)]
    values = [rng.normal(size=(B, KVH, S, D)).astype(np.float32)
              for _ in range(n_branches)]
    if with_padding:
        attn_mask = np.ones((B, S), np.int32)
        attn_mask[0, 7:] = 0
        attn_mask[1, 5:] = 0
    else:
        attn_mask = None
    bias = make_causal_bias(
        jnp.asarray(attn_mask) if attn_mask is not None else None, B, S
    )
    return q, keys, values, bias


def _repeat_kv(x):
    g = H // KVH
    t = torch.tensor(x)[:, :, None].expand(B, KVH, g, S, D)
    return t.reshape(B, H, S, D)


def _check(n_branches, with_padding):
    q, keys, values, bias = _case(n_branches, with_padding)
    ours = ttt_branch_attention_reference(
        jnp.asarray(q), [jnp.asarray(k) for k in keys],
        [jnp.asarray(v) for v in values], bias,
    )
    ref = torch_branch_attention(
        torch.tensor(q),
        [_repeat_kv(k) for k in keys],
        [_repeat_kv(v) for v in values],
        torch.tensor(np.asarray(bias)),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-5, atol=2e-6)


def test_single_branch_is_causal_attention():
    _check(1, with_padding=False)


def test_multi_branch_merge():
    for n in (2, 3, 5):
        _check(n, with_padding=False)


def test_with_key_padding():
    _check(3, with_padding=True)


def test_first_position_attends_only_itself():
    # at position 0 with one branch, output must equal v[..., 0, :]
    q, keys, values, bias = _case(1)
    out = ttt_branch_attention_reference(
        jnp.asarray(q), [jnp.asarray(keys[0])], [jnp.asarray(values[0])], bias
    )
    v0 = np.repeat(values[0], H // KVH, axis=1)  # [B, H, S, D]
    expected = v0[:, :, 0, :].transpose(0, 1, 2).reshape(B, H * D)
    np.testing.assert_allclose(
        np.asarray(out[:, 0, :]), expected, rtol=1e-5, atol=1e-6
    )


def test_masked_attention_matches_sdpa():
    rng = np.random.default_rng(1)
    q = rng.normal(size=(B, H, S, D)).astype(np.float32)
    k = rng.normal(size=(B, KVH, S, D)).astype(np.float32)
    v = rng.normal(size=(B, KVH, S, D)).astype(np.float32)
    bias = make_causal_bias(None, B, S)
    ours = masked_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias)
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.tensor(q), _repeat_kv(k), _repeat_kv(v), is_causal=True
    ).transpose(1, 2).reshape(B, S, H * D)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-5, atol=2e-6)


def test_chunked_matches_dense():
    from specforge_tpu.ops.attention import ttt_branch_attention_chunked
    import jax

    rng = np.random.default_rng(3)
    b, h, kvh, s, d = 1, 4, 2, 512, 8
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    keys = [jnp.asarray(rng.normal(size=(b, kvh, s, d)).astype(np.float32))
            for _ in range(3)]
    values = [jnp.asarray(rng.normal(size=(b, kvh, s, d)).astype(np.float32))
              for _ in range(3)]
    attn_mask = np.ones((b, s), np.int32)
    attn_mask[0, 500:] = 0
    bias = make_causal_bias(jnp.asarray(attn_mask), b, s)

    dense = ttt_branch_attention_reference(q, keys, values, bias)
    chunked = ttt_branch_attention_chunked(q, keys, values, bias, q_chunk=128)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(dense), rtol=2e-5, atol=2e-6
    )
    # gradient parity through the remat'd scan
    g_dense = jax.grad(
        lambda qq: jnp.sum(
            ttt_branch_attention_reference(qq, keys, values, bias) ** 2
        )
    )(q)
    g_chunk = jax.grad(
        lambda qq: jnp.sum(
            ttt_branch_attention_chunked(qq, keys, values, bias, q_chunk=128)
            ** 2
        )
    )(q)
    np.testing.assert_allclose(
        np.asarray(g_chunk), np.asarray(g_dense), rtol=5e-4, atol=5e-6
    )
