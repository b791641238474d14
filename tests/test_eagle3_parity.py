"""Full TTT-loop parity: JAX OnlineEagle3Model vs the fp32 torch mirror with
identical weights and inputs — losses, accuracy counts, acceptance rates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from specforge_tpu.algorithms.eagle3.model import OnlineEagle3Model
from specforge_tpu.models.draft.llama_eagle3 import Eagle3Config, LlamaEagle3Draft
from tests.torch_mirror import TorchEagle3Mirror

B, S, V, VD, H, LENGTH = 2, 16, 64, 24, 32, 4

CFG = Eagle3Config(
    vocab_size=V,
    draft_vocab_size=VD,
    hidden_size=H,
    intermediate_size=64,
    num_attention_heads=4,
    num_key_value_heads=2,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=256,
)


def make_vocab_maps(rng):
    keep = np.sort(rng.choice(V, size=VD, replace=False))
    t2d = np.zeros(V, bool)
    t2d[keep] = True
    d2t = (keep - np.arange(VD)).astype(np.int32)
    return t2d, d2t


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    t2d, d2t = make_vocab_maps(rng)
    draft = LlamaEagle3Draft(CFG, dtype=jnp.float32)
    model = OnlineEagle3Model(draft_model=draft, length=LENGTH)

    input_ids = rng.integers(0, V, size=(B, S))
    attention_mask = np.ones((B, S), np.int32)
    attention_mask[1, 12:] = 0
    loss_mask = (rng.random((B, S, 1)) > 0.25).astype(np.int64)
    hidden_states = rng.normal(size=(B, S, 3 * H)).astype(np.float32)
    target = (rng.normal(size=(B, S, V)) * 2).astype(np.float32)

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(input_ids),
        jnp.asarray(attention_mask),
        jnp.asarray(loss_mask),
        jnp.asarray(hidden_states),
        jnp.asarray(target),
    )
    variables = {
        "params": variables["params"],
        "buffers": {
            "draft_model": {"t2d": jnp.asarray(t2d), "d2t": jnp.asarray(d2t)}
        },
    }
    batch = dict(
        input_ids=input_ids,
        attention_mask=attention_mask,
        loss_mask=loss_mask,
        hidden_states=hidden_states,
        target=target,
    )
    return model, variables, batch, (t2d, d2t)


def to_mirror_weights(params, t2d, d2t):
    p = params["draft_model"]
    t = lambda a: torch.tensor(np.asarray(a, np.float32))
    w = {
        "embed": t(p["embed_tokens"]["embedding"]),
        "fc": t(p["fc"]["kernel"]).T.contiguous(),
        "lm_head": t(p["lm_head"]["kernel"]).T.contiguous(),
        "norm": t(p["norm"]["weight"]),
        "hidden_norm": t(p["midlayer"]["hidden_norm"]["weight"]),
        "input_layernorm": t(p["midlayer"]["input_layernorm"]["weight"]),
        "post_attention_layernorm": t(
            p["midlayer"]["post_attention_layernorm"]["weight"]
        ),
        "t2d": torch.tensor(t2d),
        "d2t": torch.tensor(d2t.astype(np.int64)),
    }
    # the flax draft stores q/k/v (gate/up) column-merged; the torch oracle
    # keeps them separate — slice the merged kernels
    attn = p["midlayer"]["self_attn"]
    qkv = np.asarray(attn["qkv_proj"]["kernel"], np.float32)
    qd = np.asarray(attn["o_proj"]["kernel"]).shape[0]
    kvd = (qkv.shape[1] - qd) // 2
    w["q_proj"] = torch.tensor(qkv[:, :qd]).T.contiguous()
    w["k_proj"] = torch.tensor(qkv[:, qd:qd + kvd]).T.contiguous()
    w["v_proj"] = torch.tensor(qkv[:, qd + kvd:]).T.contiguous()
    w["o_proj"] = t(attn["o_proj"]["kernel"]).T.contiguous()
    gu = np.asarray(p["midlayer"]["mlp"]["gate_up_proj"]["kernel"], np.float32)
    half = gu.shape[1] // 2
    w["gate_proj"] = torch.tensor(gu[:, :half]).T.contiguous()
    w["up_proj"] = torch.tensor(gu[:, half:]).T.contiguous()
    w["down_proj"] = t(p["midlayer"]["mlp"]["down_proj"]["kernel"]).T.contiguous()
    return w


def test_ttt_parity(setup):
    model, variables, batch, (t2d, d2t) = setup
    out = model.apply(
        variables,
        jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["attention_mask"]),
        jnp.asarray(batch["loss_mask"]),
        jnp.asarray(batch["hidden_states"]),
        jnp.asarray(batch["target"]),
    )

    mirror = TorchEagle3Mirror(
        dict(head_dim=H // 4, heads=4, kv_heads=2, eps=1e-6, rope_theta=10000.0)
    )
    mirror.w = to_mirror_weights(variables["params"], t2d, d2t)
    ref = mirror.forward(
        torch.tensor(batch["input_ids"]),
        torch.tensor(batch["attention_mask"]),
        torch.tensor(batch["loss_mask"]),
        torch.tensor(batch["hidden_states"]),
        torch.tensor(batch["target"]),
        LENGTH,
    )

    np.testing.assert_allclose(
        np.asarray(out.plosses), ref["ploss"].numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.metric_corrects), ref["correct"].numpy(), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.metric_denoms), ref["denom"].numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.acces), ref["acc"].numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.acceptance_rates), ref["acceptance"].numpy(),
        rtol=2e-4, atol=2e-5,
    )
    assert out.plosses.shape == (LENGTH,)


def test_grad_flows_and_is_finite(setup):
    model, variables, batch, _ = setup

    def loss_fn(params):
        out = model.apply(
            {"params": params, "buffers": variables["buffers"]},
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["loss_mask"]),
            jnp.asarray(batch["hidden_states"]),
            jnp.asarray(batch["target"]),
        )
        weights = jnp.asarray([0.8 ** i for i in range(LENGTH)])
        return jnp.sum(weights * out.plosses)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves
    for leaf in leaves:
        assert np.all(np.isfinite(np.asarray(leaf)))
    # lm_head must receive gradient
    g = grads["draft_model"]["lm_head"]["kernel"]
    assert float(jnp.abs(g).sum()) > 0
