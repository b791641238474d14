"""Teacher projection parity vs an independent torch implementation of the
reference math (specforge/algorithms/eagle3/model.py:487-501)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from specforge_tpu.ops.teacher import (
    compute_target_p,
    compute_target_p_from_hidden,
    compute_target_p_padded,
    tiled_logsumexp_argmax,
)

B, S, V, VD = 2, 12, 64, 24


def make_vocab_maps(rng, vocab, draft_vocab):
    keep = np.sort(rng.choice(vocab, size=draft_vocab, replace=False))
    t2d = np.zeros(vocab, bool)
    t2d[keep] = True
    d2t = keep - np.arange(draft_vocab)
    return t2d, d2t.astype(np.int64)


def torch_reference(target, t2d, loss_mask):
    target_head = target.float()
    target_token_ids = target_head.argmax(-1)
    target_mask = t2d[target_token_ids][..., None].int()
    position_mask = target_mask * loss_mask
    draft_target_head = target_head[..., t2d]
    target_p = torch.nn.Softmax(dim=2)(draft_target_head)
    target_logsumexp = torch.logsumexp(target_head, dim=-1, keepdim=True)
    target_p_on_draft = torch.exp(draft_target_head - target_logsumexp)
    return target_p, target_p_on_draft, target_token_ids, position_mask


@pytest.fixture
def case():
    rng = np.random.default_rng(0)
    t2d, d2t = make_vocab_maps(rng, V, VD)
    target = rng.normal(size=(B, S, V)).astype(np.float32) * 3
    loss_mask = (rng.random((B, S, 1)) > 0.3).astype(np.int64)
    return t2d, d2t, target, loss_mask


def test_target_p_matches_torch(case):
    t2d, d2t, target, loss_mask = case
    tp, ratio, tok, pm = compute_target_p(
        jnp.asarray(target), jnp.asarray(t2d), jnp.asarray(d2t.astype(np.int32)),
        jnp.asarray(loss_mask),
    )
    rtp, rtpod, rtok, rpm = torch_reference(
        torch.tensor(target), torch.tensor(t2d), torch.tensor(loss_mask)
    )
    np.testing.assert_allclose(np.asarray(tp), rtp.numpy(), rtol=1e-5, atol=1e-6)
    # p_on_draft is represented factored: target_p * per-position ratio
    tpod = np.asarray(tp) * np.asarray(ratio)
    np.testing.assert_allclose(tpod, rtpod.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(tok), rtok.numpy())
    np.testing.assert_array_equal(np.asarray(pm), rpm.numpy())


def test_padding_values(case):
    t2d, d2t, target, loss_mask = case
    length = 5
    tp, ratio, tok, _ = compute_target_p_padded(
        jnp.asarray(target), jnp.asarray(t2d), jnp.asarray(d2t.astype(np.int32)),
        jnp.asarray(loss_mask), length,
    )
    assert tp.shape == (B, S + length, VD)
    np.testing.assert_allclose(np.asarray(tp[:, S:]), 1.0 / VD)
    np.testing.assert_allclose(np.asarray(ratio[:, S:]), 0.0)
    np.testing.assert_array_equal(np.asarray(tok[:, S:]), 0)


def test_tiled_logsumexp_argmax_matches_dense():
    rng = np.random.default_rng(1)
    hidden = rng.normal(size=(B, S, 16)).astype(np.float32)
    weight = rng.normal(size=(V, 16)).astype(np.float32)
    logz, amax = tiled_logsumexp_argmax(
        jnp.asarray(hidden), jnp.asarray(weight), chunk_size=20
    )
    dense = hidden @ weight.T
    ref_logz = torch.logsumexp(torch.tensor(dense), dim=-1, keepdim=True).numpy()
    np.testing.assert_allclose(np.asarray(logz), ref_logz, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(amax), dense.argmax(-1))


def test_tiled_argmax_tie_resolves_low_index():
    # duplicate head rows → identical logits at two vocab slots in
    # different chunks; argmax must pick the lower index like torch.argmax.
    hidden = np.ones((1, 1, 4), np.float32)
    weight = np.zeros((10, 4), np.float32)
    weight[2] = 1.0
    weight[7] = 1.0
    _, amax = tiled_logsumexp_argmax(
        jnp.asarray(hidden), jnp.asarray(weight), chunk_size=3
    )
    assert int(amax[0, 0]) == 2


def test_compact_teacher_matches_full(case):
    t2d, d2t, _, loss_mask = case
    rng = np.random.default_rng(2)
    hidden = rng.normal(size=(B, S, 16)).astype(np.float32)
    weight = rng.normal(size=(V, 16)).astype(np.float32)
    full_logits = hidden @ weight.T
    full = compute_target_p(
        jnp.asarray(full_logits), jnp.asarray(t2d),
        jnp.asarray(d2t.astype(np.int32)), jnp.asarray(loss_mask),
    )
    compact = compute_target_p_from_hidden(
        jnp.asarray(hidden), jnp.asarray(weight), jnp.asarray(t2d),
        jnp.asarray(d2t.astype(np.int32)), jnp.asarray(loss_mask), chunk_size=18,
    )
    for f, c in zip(full, compact):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(c), rtol=2e-5, atol=2e-5
        )

