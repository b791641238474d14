"""COD sequence packing (PackingCollator + packed P-EAGLE training).

Packing is the bs1 answer to P-EAGLE's HBM-bound MFU floor: the reference
trains P-EAGLE one sample per rank (specforge/algorithms/peagle/model.py);
packing multiple short documents into one row raises supervised tokens per
optimizer step without batching, with the COD sampler/mask confined to
document boundaries by the ``lengths`` vector.
"""

import jax
import jax.numpy as jnp
import numpy as np

from specforge_tpu.algorithms.peagle.model import (
    document_ids_from_lengths,
    generate_cod_sample_indices,
    peagle_allow_mask,
)
from specforge_tpu.data.collator import (
    CollatorConfig,
    PackingCollator,
    PackingCollatorConfig,
    PaddingCollator,
)


def _doc(rng, n, h=6, v=32):
    return {
        "input_ids": rng.integers(0, v, size=(n,)).astype(np.int32),
        "loss_mask": np.ones((n, 1), np.int32),
        "hidden_state": rng.normal(size=(n, h)).astype(np.float32),
        "target": rng.normal(size=(n, h)).astype(np.float32),
    }


def test_packing_collator_shapes_and_boundaries():
    rng = np.random.default_rng(0)
    docs = [_doc(rng, n) for n in (5, 7, 3, 4)]
    collate = PackingCollator(
        PackingCollatorConfig(max_length=16, rows=2, max_docs_per_row=4)
    )
    batch = collate(docs, sample_ids=["a", "b", "c", "d"])
    t = batch.tensors
    assert t["input_ids"].shape == (2, 16)
    assert t["hidden_state"].shape == (2, 16, 6)
    assert t["lengths"].shape == (2, 4)
    assert t["loss_mask"].shape == (2, 16, 1)
    # every document is placed, nothing truncated (5+7+3+4 = 19 <= 2*16)
    assert int(t["lengths"].sum()) == 19
    assert batch.metadata["packing"]["dropped_docs"] == 0
    assert batch.metadata["packing"]["truncated_tokens"] == 0
    for r in range(2):
        lens = [int(x) for x in t["lengths"][r] if x > 0]
        total = sum(lens)
        # attention mask covers exactly the packed span
        np.testing.assert_array_equal(
            t["attention_mask"][r], ([1] * total + [0] * (16 - total))
        )
        # the teacher-shift boundary: last position of each doc is unmasked
        end = 0
        for n in lens:
            end += n
            assert t["loss_mask"][r, end - 1, 0] == 0
    # packed rows reassemble the original docs (arrival order inside a row)
    placed = {}
    for r in range(2):
        off = 0
        for n in [int(x) for x in t["lengths"][r] if x > 0]:
            ids = t["input_ids"][r, off:off + n]
            placed[tuple(ids.tolist())] = True
            off += n
    for d in docs:
        assert tuple(d["input_ids"].tolist()) in placed


def test_packed_single_doc_matches_padding_collator():
    rng = np.random.default_rng(1)
    doc = _doc(rng, 9)
    packed = PackingCollator(
        PackingCollatorConfig(max_length=12, rows=1, max_docs_per_row=2)
    )([doc])
    padded = PaddingCollator(CollatorConfig(max_length=12))([doc])
    for name in ("input_ids", "hidden_state", "target", "attention_mask"):
        np.testing.assert_array_equal(
            packed.tensors[name], padded.tensors[name]
        )
    # identical except the boundary position's loss mask
    expect = np.asarray(padded.tensors["loss_mask"]).copy()
    expect[0, 8, 0] = 0
    np.testing.assert_array_equal(packed.tensors["loss_mask"], expect)
    np.testing.assert_array_equal(packed.tensors["lengths"], [[9, 0]])


def test_packing_collator_truncates_overflow_into_largest_gap():
    rng = np.random.default_rng(2)
    docs = [_doc(rng, n) for n in (10, 9, 8)]
    collate = PackingCollator(
        PackingCollatorConfig(max_length=12, rows=2, max_docs_per_row=2)
    )
    batch = collate(docs)
    meta = batch.metadata["packing"]
    # 10 and 9 take a row each; the 8-doc truncates into the larger gap (3)
    assert meta["truncated_tokens"] == 5
    assert meta["dropped_docs"] == 0
    assert int(batch.tensors["lengths"].sum()) == 22


def test_packed_allow_mask_no_cross_document_attention():
    s = 24
    lengths = jnp.asarray([10, 8, 6], jnp.int32)
    doc_ids = document_ids_from_lengths(lengths, s)
    loss_mask = np.ones(s, np.int32)
    loss_mask[[9, 17, 23]] = 0  # boundary masking, as the collator emits
    sample = generate_cod_sample_indices(
        jax.random.PRNGKey(0), jnp.asarray(loss_mask), doc_ids,
        num_depths=3, down_sample_ratio=0.7, down_sample_ratio_min=0.2,
    )
    allow = np.asarray(peagle_allow_mask(sample, doc_ids))
    docs = np.asarray(doc_ids)
    pos = np.asarray(sample.anchor_pos) + np.asarray(sample.depth)
    valid = np.asarray(sample.valid)
    q_idx, k_idx = np.nonzero(allow)
    for q, k in zip(q_idx, k_idx):
        assert valid[q] and valid[k]
        assert docs[pos[q]] == docs[pos[k]] >= 0
    # and depth-1 anchors never cross a boundary
    d1 = valid & (np.asarray(sample.depth) == 1)
    anchors = np.asarray(sample.anchor_pos)
    assert (docs[anchors[d1]] == docs[pos[d1]]).all()


def test_peagle_trains_on_packed_rows():
    from tests.test_peagle import _build
    from specforge_tpu.training.optimizer import (
        OptimizerConfig,
        build_optimizer,
    )
    from specforge_tpu.training.strategies import PEagleTrainStrategy
    from specforge_tpu.training.train_step import TrainState, make_train_step

    model, variables, tensors = _build()
    assert PEagleTrainStrategy.supports_packed_documents
    s = tensors["input_ids"].shape[1]
    # same row, now declared as three packed documents with boundary masking
    lengths = np.asarray([[s // 2, s // 4, s - s // 2 - s // 4]], np.int32)
    loss_mask = np.asarray(tensors["loss_mask"]).copy()
    ends = np.cumsum(lengths[0])
    loss_mask[0, ends - 1] = 0
    packed = dict(tensors)
    packed["loss_mask"] = jnp.asarray(loss_mask)
    packed["lengths"] = jnp.asarray(lengths)

    strategy = PEagleTrainStrategy(model)
    tx = build_optimizer(OptimizerConfig(lr=1e-3), 20)
    state = TrainState.create(variables["params"], variables["buffers"], tx)
    step_fn = make_train_step(strategy, tx, accum_steps=1, total_steps=20)
    batch = {k: v[None] for k, v in packed.items()}
    losses = []
    for _ in range(5):
        state, metrics = step_fn(state, batch, {})
        losses.append(float(metrics["train/loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_composition_rejects_packing_for_non_cod_strategy():
    from specforge_tpu.training.strategies import Eagle3TrainStrategy

    assert not getattr(
        Eagle3TrainStrategy, "supports_packed_documents", False
    )
