"""Feature files, stores, manifest reader, dataloader — through the production
paths with tiny synthetic tensors (reference test strategy §4.3/4.6)."""

import os
import queue

import ml_dtypes
import numpy as np
import pytest

from specforge_tpu.data.collator import CollatorConfig, PaddingCollator
from specforge_tpu.runtime.data_plane.feature_dataloader import FeatureDataLoader
from specforge_tpu.runtime.data_plane.feature_file import (
    load_feature_file,
    read_feature_specs,
    save_feature_file,
)
from specforge_tpu.runtime.data_plane.feature_store import (
    FileFeatureStore,
    InMemoryFeatureStore,
    SharedDirFeatureStore,
    StaleReferenceError,
)
from specforge_tpu.runtime.data_plane.offline_reader import (
    OfflineManifestReader,
    shard_refs,
)

H = 8


def sample_tensors(rng, seq_len):
    return {
        "input_ids": rng.integers(0, 100, size=(seq_len,)).astype(np.int64),
        "loss_mask": (rng.random(seq_len) > 0.3).astype(np.int64),
        "hidden_state": rng.normal(size=(seq_len, 3 * H)).astype(
            ml_dtypes.bfloat16
        ),
        "target": rng.normal(size=(seq_len, H)).astype(ml_dtypes.bfloat16),
    }


def write_dataset(root, n=6, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        tensors = sample_tensors(rng, seq_len=10 + i)
        save_feature_file(
            os.path.join(root, f"sample-{i:04d}.sft"),
            tensors,
            {"target_repr": "hidden_state"},
        )


def test_feature_file_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = sample_tensors(rng, 12)
    path = str(tmp_path / "x.sft")
    save_feature_file(path, tensors, {"target_repr": "hidden_state"})
    loaded, meta = load_feature_file(path)
    assert meta["target_repr"] == "hidden_state"
    for k in tensors:
        np.testing.assert_array_equal(
            np.asarray(loaded[k], np.float32), np.asarray(tensors[k], np.float32)
        )
    specs, meta2 = read_feature_specs(path)
    assert specs["hidden_state"].shape == (12, 3 * H)
    assert specs["hidden_state"].dtype == "bfloat16"
    assert meta2 == meta


def test_torch_ckpt_compat(tmp_path):
    import torch

    path = str(tmp_path / "y.ckpt")
    torch.save(
        {
            "input_ids": torch.arange(8),
            "hidden_state": torch.randn(8, 4, dtype=torch.bfloat16),
        },
        path,
    )
    tensors, _ = load_feature_file(path)
    assert tensors["hidden_state"].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(tensors["input_ids"], np.arange(8))


def test_memory_store_lifecycle():
    store = InMemoryFeatureStore(max_resident_bytes=10_000)
    rng = np.random.default_rng(0)
    ref = store.put_sample("s0", sample_tensors(rng, 8))
    out = store.fetch(ref)
    assert set(out) == {"input_ids", "loss_mask", "hidden_state", "target"}
    assert store.health()["resident_samples"] == 1
    store.release(["s0"])
    assert store.health()["resident_samples"] == 0
    with pytest.raises(KeyError):
        store.fetch(ref)


def test_memory_store_backpressure_and_generation():
    store = InMemoryFeatureStore(max_resident_bytes=300)
    rng = np.random.default_rng(0)
    store.put_sample("a", {"x": np.zeros(50, np.float32)})
    with pytest.raises(MemoryError):
        store.put_sample("b", {"x": np.zeros(50, np.float32)})
    ref = store.put_sample("c", {"x": np.zeros(2, np.float32)})
    store.generation += 1  # producer restart
    with pytest.raises(StaleReferenceError):
        store.fetch(ref)


def test_shared_dir_store(tmp_path):
    store = SharedDirFeatureStore(str(tmp_path / "plane"))
    rng = np.random.default_rng(0)
    ref = store.put_sample("s1", sample_tensors(rng, 9), {"target_repr": "x"})
    out = store.fetch(ref)
    assert out["hidden_state"].shape == (9, 3 * H)
    store.release(["s1"])
    with pytest.raises(StaleReferenceError):
        store.fetch(ref)


def test_manifest_reader_and_sharding(tmp_path):
    write_dataset(str(tmp_path), n=7)
    reader = OfflineManifestReader(str(tmp_path))
    refs = reader.read()
    assert [r.sample_id for r in refs] == [f"sample-{i:04d}" for i in range(7)]
    s0 = shard_refs(refs, 0, 2)
    s1 = shard_refs(refs, 1, 2)
    assert len(s0) == len(s1) == 3  # drop remainder keeps lockstep
    assert {r.sample_id for r in s0}.isdisjoint({r.sample_id for r in s1})


@pytest.mark.parametrize("num_workers", [0, 3])
def test_dataloader_offline_end_to_end(tmp_path, num_workers):
    write_dataset(str(tmp_path), n=6)
    refs = OfflineManifestReader(str(tmp_path)).read()
    collate = PaddingCollator(
        CollatorConfig(max_length=16, cast_float_dtype="float32")
    )
    loader = FeatureDataLoader(
        FileFeatureStore(), collate, refs=refs, batch_size=2,
        num_workers=num_workers, metadata={"target_repr": "hidden_state"},
    )
    batches = list(loader)
    assert len(batches) == 3 == len(loader)
    b = batches[0]
    assert b.tensors["input_ids"].shape == (2, 16)
    assert b.tensors["hidden_state"].shape == (2, 16, 3 * H)
    assert b.tensors["loss_mask"].shape == (2, 16, 1)
    assert b.tensors["attention_mask"].shape == (2, 16)
    assert b.tensors["attention_mask"][0].sum() == 10  # true length kept
    assert b.metadata["target_repr"] == "hidden_state"
    assert b.sample_ids == ["sample-0000", "sample-0001"]
    # deterministic order independent of worker count
    ids = [sid for batch in batches for sid in batch.sample_ids]
    assert ids == [f"sample-{i:04d}" for i in range(6)]


def test_dataloader_seek(tmp_path):
    write_dataset(str(tmp_path), n=6)
    refs = OfflineManifestReader(str(tmp_path)).read()
    collate = PaddingCollator(CollatorConfig(max_length=16))
    loader = FeatureDataLoader(
        FileFeatureStore(), collate, refs=refs, batch_size=2, num_workers=0
    )
    loader.seek(4)
    batches = list(loader)
    assert [b.sample_ids for b in batches] == [["sample-0004", "sample-0005"]]


def test_dataloader_streaming_queue(tmp_path):
    store = InMemoryFeatureStore()
    rng = np.random.default_rng(0)
    q = queue.Queue()
    for i in range(5):
        q.put(store.put_sample(f"s{i}", sample_tensors(rng, 8)))
    q.put(None)
    collate = PaddingCollator(CollatorConfig(max_length=12))
    loader = FeatureDataLoader(
        store, collate, ref_queue=q, batch_size=2, num_workers=2
    )
    batches = list(loader)
    assert [b.sample_ids for b in batches] == [["s0", "s1"], ["s2", "s3"]]


def test_sample_ref_queue_lease_ack_fail():
    from specforge_tpu.runtime.contracts import (
        FeatureHandle,
        FeatureSpec,
        SampleRef,
    )
    from specforge_tpu.runtime.data_plane.sample_ref_queue import (
        SampleRefQueue,
    )

    def ref(sid):
        return SampleRef(sample_id=sid, features={
            "x": FeatureHandle(
                uri=f"mem://{sid}/x.g0",
                spec=FeatureSpec(name="x", shape=(4,), dtype="float32"),
            )
        })

    q = SampleRefQueue(max_attempts=2)
    assert q.stage([ref("a"), ref("b")]) == 2
    assert q.stage([ref("a")]) == 0                    # idempotent

    leased = q.lease("c1", limit=2)
    assert [r.sample_id for r in leased] == ["a", "b"]
    assert q.lease("c2", limit=2) == []                # invisible while leased

    q.ack(["a"])
    assert q.stage([ref("a")]) == 0                    # acked never restages

    q.fail(["b"])                                      # attempt 1 -> ready
    assert [r.sample_id for r in q.lease("c2")] == ["b"]
    q.fail(["b"])                                      # attempt 2 == cap -> poisoned
    assert q.lease("c2") == []
    s = q.status()
    assert s["acked"] == 1 and s["poisoned"] == 1 and s["staged"] == 0


def test_inmemory_store_pin_and_gc_sweep():
    from specforge_tpu.runtime.data_plane.feature_store import (
        InMemoryFeatureStore,
    )

    store = InMemoryFeatureStore()
    kept = store.put_sample("keep", {"x": np.ones(4, np.float32)})
    store.put_sample("leak", {"x": np.zeros(4, np.float32)})
    store.pin(["keep"])
    removed = store.gc_sweep(0.0)
    assert removed == 1
    assert store.fetch(kept)["x"].sum() == 4.0
    assert store.health()["resident_samples"] == 1
    store.unpin(["keep"])
    assert store.gc_sweep(0.0) == 1
