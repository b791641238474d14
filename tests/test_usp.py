"""USP (Ulysses × Ring) TTT attention vs the single-device dense oracle,
on the 8-virtual-device CPU mesh — forward and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from specforge_tpu.ops.attention import (
    make_causal_bias,
    ttt_branch_attention_reference,
)
from specforge_tpu.parallel.mesh import MeshConfig, build_mesh
from specforge_tpu.parallel.usp import usp_ttt_attention

B, H, D, S = 1, 4, 8, 32


def _case(n_branches, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    keys = [jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
            for _ in range(n_branches)]
    values = [jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
              for _ in range(n_branches)]
    return q, keys, values


@pytest.mark.parametrize("impl", ["dense", "pallas"])
@pytest.mark.parametrize("topo", [(2, 2), (1, 4), (4, 1), (2, 4)])
@pytest.mark.parametrize("n_branches", [1, 3])
def test_usp_matches_dense(topo, n_branches, impl):
    u, r = topo
    mesh = build_mesh(
        MeshConfig(sp_ulysses=u, sp_ring=r), devices=jax.devices()[: u * r]
    )
    q, keys, values = _case(n_branches)
    bias = make_causal_bias(None, B, S)
    expected = ttt_branch_attention_reference(q, keys, values, bias)
    got = usp_ttt_attention(mesh, q, keys, values, impl=impl)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("impl", ["dense", "pallas"])
def test_usp_with_key_padding(impl):
    mesh = build_mesh(
        MeshConfig(sp_ulysses=2, sp_ring=2), devices=jax.devices()[:4]
    )
    q, keys, values = _case(2)
    attention_mask = np.ones((B, S), np.int32)
    attention_mask[0, 25:] = 0
    bias = make_causal_bias(jnp.asarray(attention_mask), B, S)
    expected = ttt_branch_attention_reference(q, keys, values, bias)
    got = usp_ttt_attention(
        mesh, q, keys, values, key_valid=jnp.asarray(attention_mask),
        impl=impl,
    )
    valid = attention_mask[0].astype(bool)
    np.testing.assert_allclose(
        np.asarray(got)[0, valid], np.asarray(expected)[0, valid],
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.parametrize("impl", ["dense", "pallas"])
def test_usp_gradients_match_dense(impl):
    mesh = build_mesh(
        MeshConfig(sp_ulysses=2, sp_ring=2), devices=jax.devices()[:4]
    )
    q, keys, values = _case(2)
    bias = make_causal_bias(None, B, S)

    def loss_dense(q, k0, v0):
        out = ttt_branch_attention_reference(
            q, [k0, keys[1]], [v0, values[1]], bias
        )
        return jnp.sum(out * out)

    def loss_usp(q, k0, v0):
        out = usp_ttt_attention(
            mesh, q, [k0, keys[1]], [v0, values[1]], impl=impl
        )
        return jnp.sum(out * out)

    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, keys[0], values[0])
    g_usp = jax.grad(loss_usp, argnums=(0, 1, 2))(q, keys[0], values[0])
    for gd, gu in zip(g_dense, g_usp):
        np.testing.assert_allclose(
            np.asarray(gu), np.asarray(gd), rtol=5e-4, atol=5e-5
        )


def test_usp_full_ttt_model_matches_dense():
    """OnlineEagle3Model with usp backend on a (fsdp=2? no) sp mesh equals the
    dense single-device model bit-for-bit-ish — same weights, same batch."""
    from specforge_tpu.algorithms.eagle3.model import OnlineEagle3Model
    from specforge_tpu.models.draft.llama_eagle3 import (
        Eagle3Config,
        LlamaEagle3Draft,
    )

    cfg = Eagle3Config(
        vocab_size=64, draft_vocab_size=24, hidden_size=32,
        intermediate_size=64, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    rng = np.random.default_rng(0)
    batch = dict(
        input_ids=jnp.asarray(rng.integers(0, 64, size=(1, S))),
        attention_mask=jnp.ones((1, S), jnp.int32),
        loss_mask=jnp.asarray((rng.random((1, S, 1)) > 0.25).astype(np.int32)),
        hidden_states=jnp.asarray(
            rng.normal(size=(1, S, 96)).astype(np.float32)
        ),
        target=jnp.asarray(
            (rng.normal(size=(1, S, 64)) * 2).astype(np.float32)
        ),
    )
    args = (batch["input_ids"], batch["attention_mask"], batch["loss_mask"],
            batch["hidden_states"], batch["target"])

    dense = OnlineEagle3Model(
        draft_model=LlamaEagle3Draft(cfg, dtype=jnp.float32), length=3
    )
    variables = dense.init(jax.random.PRNGKey(0), *args)
    out_dense = dense.apply(variables, *args)

    mesh = build_mesh(
        MeshConfig(sp_ulysses=2, sp_ring=2), devices=jax.devices()[:4]
    )
    usp = OnlineEagle3Model(
        draft_model=LlamaEagle3Draft(
            cfg, dtype=jnp.float32, attention_backend="usp", mesh=mesh
        ),
        length=3,
    )
    out_usp = usp.apply(variables, *args)
    np.testing.assert_allclose(
        np.asarray(out_usp.plosses), np.asarray(out_dense.plosses),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_usp.acceptance_rates),
        np.asarray(out_dense.acceptance_rates), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(out_usp.metric_corrects),
        np.asarray(out_dense.metric_corrects),
    )


def test_usp_long_context_s4096():
    """s4096 USP composition executes on the 8-virtual-device mesh (the
    long-context seq-sharded path behind the single-chip s4096 bench row;
    real multi-chip MFU is hardware-blocked — benchmarks/scaling.py)."""
    u, r = 2, 4
    mesh = build_mesh(
        MeshConfig(sp_ulysses=u, sp_ring=r), devices=jax.devices()[: u * r]
    )
    s = 4096
    h, d = 2, 8
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, h, s, d)).astype(np.float32))
    keys = [jnp.asarray(rng.normal(size=(B, h, s, d)).astype(np.float32))]
    values = [jnp.asarray(rng.normal(size=(B, h, s, d)).astype(np.float32))]
    bias = make_causal_bias(None, B, s)
    expected = ttt_branch_attention_reference(q, keys, values, bias)
    got = usp_ttt_attention(mesh, q, keys, values, impl="dense")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
    )
