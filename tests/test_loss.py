"""Fused CE loss: XLA reference vs torch oracle; custom-VJP grad vs autodiff;
Pallas kernels in interpreter mode vs the XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from specforge_tpu.ops.loss import log_softmax_loss, log_softmax_loss_reference
from specforge_tpu.ops.loss_pallas import loss_backward_pallas, loss_forward_pallas

B, T, V = 2, 8, 40


def torch_loss(logits, target_p, position_mask):
    logits = logits.float()
    out_logp = torch.nn.LogSoftmax(dim=2)(logits)
    plogp = target_p * out_logp
    return -torch.sum(position_mask * plogp, 2).mean()


@pytest.fixture
def case():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(B, T, V)).astype(np.float32) * 2
    target_p = rng.random((B, T, V)).astype(np.float32)
    target_p /= target_p.sum(-1, keepdims=True)
    mask = (rng.random((B, T, 1)) > 0.25).astype(np.int32)
    return logits, target_p, mask


def test_reference_matches_torch(case):
    logits, target_p, mask = case
    ours = log_softmax_loss_reference(
        jnp.asarray(logits), jnp.asarray(target_p), jnp.asarray(mask)
    )
    ref = torch_loss(
        torch.tensor(logits), torch.tensor(target_p), torch.tensor(mask)
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


def test_custom_vjp_matches_autodiff(case):
    logits, target_p, mask = case
    args = (jnp.asarray(logits), jnp.asarray(target_p), jnp.asarray(mask))
    loss_fused = log_softmax_loss(*args)
    loss_ref = log_softmax_loss_reference(*args)
    np.testing.assert_allclose(float(loss_fused), float(loss_ref), rtol=1e-6)

    g_fused = jax.grad(lambda l: log_softmax_loss(l, *args[1:]))(args[0])
    g_ref = jax.grad(lambda l: log_softmax_loss_reference(l, *args[1:]))(args[0])
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=1e-5, atol=1e-7
    )


def test_masked_rows_zero_grad(case):
    logits, target_p, _ = case
    mask = np.zeros((B, T, 1), np.int32)
    g = jax.grad(
        lambda l: log_softmax_loss(l, jnp.asarray(target_p), jnp.asarray(mask))
    )(jnp.asarray(logits))
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_bf16_logits_grad_dtype(case):
    logits, target_p, mask = case
    bf = jnp.asarray(logits, jnp.bfloat16)
    g = jax.grad(
        lambda l: log_softmax_loss(l, jnp.asarray(target_p), jnp.asarray(mask))
    )(bf)
    assert g.dtype == jnp.bfloat16


@pytest.mark.parametrize("shape", [(2, 8, 40), (1, 300, 2500), (3, 100, 2048)])
def test_pallas_interpret_forward_backward(shape):
    b, t, v = shape
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(b, t, v)).astype(np.float32))
    target_p = rng.random((b, t, v)).astype(np.float32)
    target_p = jnp.asarray(target_p / target_p.sum(-1, keepdims=True))
    mask = jnp.asarray((rng.random((b, t, 1)) > 0.3).astype(np.int32))

    loss_p, residuals = loss_forward_pallas(logits, target_p, mask, interpret=True)
    loss_ref = log_softmax_loss_reference(logits, target_p, mask)
    np.testing.assert_allclose(float(loss_p), float(loss_ref), rtol=1e-5)

    g = jnp.asarray(0.7, jnp.float32)
    grad_p = loss_backward_pallas(logits, target_p, residuals, g, interpret=True)
    grad_ref = jax.grad(
        lambda l: log_softmax_loss_reference(l, target_p, mask) * g
    )(logits)
    np.testing.assert_allclose(
        np.asarray(grad_p), np.asarray(grad_ref), rtol=1e-4, atol=1e-6
    )
