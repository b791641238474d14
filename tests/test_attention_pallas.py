"""Pallas TTT flash attention: interpret-mode parity vs the dense oracle,
forward and backward, with and without branches/padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from specforge_tpu.ops.attention import (
    make_causal_bias,
    ttt_branch_attention_reference,
)
from specforge_tpu.ops.attention_pallas import ttt_flash_attention

B, H, KVH, D = 1, 2, 2, 64
S = 512  # two 256-tiles


def _case(n_branches, seed=0, padding=False):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    keys = [jnp.asarray(rng.normal(size=(B, KVH, S, D)).astype(np.float32))
            for _ in range(n_branches)]
    values = [jnp.asarray(rng.normal(size=(B, KVH, S, D)).astype(np.float32))
              for _ in range(n_branches)]
    if padding:
        mask = np.ones((B, S), np.int32)
        mask[0, S - 40:] = 0
        key_valid = jnp.asarray(mask)
        bias = make_causal_bias(key_valid, B, S)
    else:
        key_valid = None
        bias = make_causal_bias(None, B, S)
    return q, keys, values, bias, key_valid


@pytest.mark.parametrize("n_branches", [1, 3])
def test_forward_matches_dense(n_branches):
    q, keys, values, bias, _ = _case(n_branches)
    expected = ttt_branch_attention_reference(q, keys, values, bias)
    got = ttt_flash_attention(q, keys, values, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )


def test_forward_with_padding():
    q, keys, values, bias, key_valid = _case(2, padding=True)
    expected = ttt_branch_attention_reference(q, keys, values, bias)
    got = ttt_flash_attention(q, keys, values, key_valid=key_valid,
                              interpret=True)
    valid = np.asarray(key_valid)[0].astype(bool)
    np.testing.assert_allclose(
        np.asarray(got)[0, valid], np.asarray(expected)[0, valid],
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.parametrize("n_branches", [1, 3])
def test_backward_matches_dense(n_branches):
    q, keys, values, bias, _ = _case(n_branches, seed=1)

    def loss_dense(q, ks, vs):
        out = ttt_branch_attention_reference(q, list(ks), list(vs), bias)
        return jnp.sum(out * out)

    def loss_flash(q, ks, vs):
        out = ttt_flash_attention(q, list(ks), list(vs), interpret=True)
        return jnp.sum(out * out)

    g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(q, tuple(keys),
                                                  tuple(values))
    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, tuple(keys),
                                                  tuple(values))
    np.testing.assert_allclose(np.asarray(g_f[0]), np.asarray(g_d[0]),
                               rtol=5e-4, atol=5e-5)
    for i in range(n_branches):
        np.testing.assert_allclose(
            np.asarray(g_f[1][i]), np.asarray(g_d[1][i]),
            rtol=5e-4, atol=5e-5,
        )
        np.testing.assert_allclose(
            np.asarray(g_f[2][i]), np.asarray(g_d[2][i]),
            rtol=5e-4, atol=5e-5,
        )


def test_adaptive_512_tiles_at_long_seq_non_multiple():
    """Seq-adaptive tile defaults (r5 sweep: 2048-wide tiles under the 96M
    scoped-vmem budget); a length that is NOT a tile multiple must still
    match the dense oracle fwd+bwd (grid remainder masking)."""
    s = 1152  # one full 1024-tile + a 128 remainder
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, H, s, D)).astype(np.float32))
    keys = [jnp.asarray(rng.normal(size=(B, KVH, s, D)).astype(np.float32))
            for _ in range(2)]
    values = [jnp.asarray(rng.normal(size=(B, KVH, s, D)).astype(np.float32))
              for _ in range(2)]
    mask = np.ones((B, s), np.int32)
    mask[0, s - 70:] = 0
    key_valid = jnp.asarray(mask)
    bias = make_causal_bias(key_valid, B, s)

    from specforge_tpu.ops.attention_pallas import _env_tiles

    assert _env_tiles(None, None, s) == (1024, 1024)
    assert _env_tiles(None, None, 768) == (768, 768)
    assert _env_tiles(None, None, 2048) == (2048, 2048)
    assert _env_tiles(None, None, 4096) == (1024, 2048)

    def flash_sum(q_, ks, vs):
        return jnp.sum(ttt_flash_attention(
            q_, ks, vs, key_valid=key_valid, interpret=True
        ))

    def dense_sum(q_, ks, vs):
        return jnp.sum(ttt_branch_attention_reference(q_, ks, vs, bias))

    got = ttt_flash_attention(q, keys, values, key_valid=key_valid,
                              interpret=True)
    expected = ttt_branch_attention_reference(q, keys, values, bias)
    valid = np.asarray(key_valid)[0].astype(bool)
    assert not np.isnan(np.asarray(got)).any()
    np.testing.assert_allclose(
        np.asarray(got)[0, valid], np.asarray(expected)[0, valid],
        rtol=3e-5, atol=3e-5,
    )
    g_flash = jax.grad(flash_sum, argnums=(0,))(q, keys, values)[0]
    g_dense = jax.grad(dense_sum, argnums=(0,))(q, keys, values)[0]
    assert not np.isnan(np.asarray(g_flash)).any()
    np.testing.assert_allclose(
        np.asarray(g_flash)[:, :, valid], np.asarray(g_dense)[:, :, valid],
        rtol=3e-4, atol=3e-4,
    )
