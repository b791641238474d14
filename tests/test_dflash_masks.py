"""DFlash mask parity vs a torch mirror of the reference sdpa mask builder,
chunk-mask consistency, anchor sampling, accept-length."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from specforge_tpu.algorithms.common.dflash_family import compute_accept_len
from specforge_tpu.ops.masks import (
    dflash_chunk_mask,
    dflash_dense_mask,
    sample_anchor_positions,
)

B, N, BS, S = 2, 4, 4, 20


def torch_dflash_mask(anchor_positions, block_keep_mask, S, block_size,
                      sliding_window=None):
    B, N = anchor_positions.shape
    Q = N * block_size
    KV = S + Q
    q_idx = torch.arange(Q).view(1, 1, -1, 1)
    kv_idx = torch.arange(KV).view(1, 1, 1, -1)
    q_block = q_idx // block_size
    q_off = q_idx % block_size
    anchor = anchor_positions.view(B, 1, N, 1).repeat_interleave(block_size, 2)
    mask_ctx = (kv_idx < S) & (kv_idx < anchor)
    if sliding_window is not None:
        lower = anchor + q_off - (sliding_window - 1)
        mask_ctx = mask_ctx & (kv_idx >= lower)
    is_draft = kv_idx >= S
    kv_block = (kv_idx - S) // block_size
    mask_draft = is_draft & (q_block == kv_block)
    if sliding_window is not None:
        kv_off = (kv_idx - S) % block_size
        mask_draft = mask_draft & (kv_off <= q_off)
    valid = block_keep_mask.view(B, 1, N, 1).repeat_interleave(block_size, 2)
    return (mask_ctx | mask_draft) & valid


def _case(sliding=None):
    rng = np.random.default_rng(0)
    anchors = np.sort(rng.integers(1, S - 1, size=(B, N)), axis=1).astype(np.int32)
    keep = np.ones((B, N), bool)
    keep[1, 3] = False
    return anchors, keep


def test_dense_mask_matches_torch():
    for sliding in (None, 5):
        anchors, keep = _case()
        ours = dflash_dense_mask(
            jnp.asarray(anchors), jnp.asarray(keep), S, BS, sliding
        )
        ref = torch_dflash_mask(
            torch.tensor(anchors), torch.tensor(keep), S, BS, sliding
        )
        np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


def test_chunk_mask_consistent_with_dense():
    for sliding in (None, 5):
        anchors, keep = _case()
        dense = np.asarray(
            dflash_dense_mask(jnp.asarray(anchors), jnp.asarray(keep), S, BS,
                              sliding)
        )[:, 0]  # [B, Q, S+Q]
        cg = 2
        for c in range(N // cg):
            chunk = dflash_chunk_mask(
                jnp.asarray(anchors[:, c * cg:(c + 1) * cg]),
                jnp.asarray(keep[:, c * cg:(c + 1) * cg]),
                S, BS, sliding,
            )
            q0 = c * cg * BS
            # context part
            np.testing.assert_array_equal(
                np.asarray(chunk)[:, :, :S], dense[:, q0:q0 + cg * BS, :S]
            )
            # draft part: chunk keys are the chunk's own draft keys
            np.testing.assert_array_equal(
                np.asarray(chunk)[:, :, S:],
                dense[:, q0:q0 + cg * BS, S + q0:S + q0 + cg * BS],
            )


def test_anchor_sampling_properties():
    rng = np.random.default_rng(1)
    loss_mask = (rng.random((3, 32)) > 0.4).astype(np.int32)
    anchors, keep = sample_anchor_positions(
        jax.random.PRNGKey(0), jnp.asarray(loss_mask), num_anchors=8
    )
    anchors, keep = np.asarray(anchors), np.asarray(keep)
    assert anchors.shape == keep.shape == (3, 8)
    for bi in range(3):
        kept = anchors[bi][keep[bi]]
        assert (np.sort(kept) == kept).all()
        assert len(set(kept.tolist())) == len(kept)
        for a in kept:
            assert loss_mask[bi, a] and loss_mask[bi, a + 1]
    # determinism by key
    anchors2, _ = sample_anchor_positions(
        jax.random.PRNGKey(0), jnp.asarray(loss_mask), num_anchors=8
    )
    np.testing.assert_array_equal(anchors, np.asarray(anchors2))


def test_compute_accept_len_matches_torch():
    rng = np.random.default_rng(2)
    pred = rng.integers(0, 5, size=(2, 3, 6))
    target = rng.integers(0, 5, size=(2, 3, 6))
    valid = rng.random((2, 3, 6)) > 0.3

    ours = compute_accept_len(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(valid)
    )
    correct = (torch.tensor(pred) == torch.tensor(target)) | (
        ~torch.tensor(valid)
    )
    ref = (correct.long().cumprod(dim=2) * torch.tensor(valid).long()).sum(
        dim=2
    ).float()
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())
