"""Network feature store: C++ server built from source + Python client,
through the full store contract and a loader round-trip."""

import os
import shutil
import socket
import subprocess
import time

import ml_dtypes
import numpy as np
import pytest

from specforge_tpu.runtime.data_plane.network_store import NetworkFeatureStore

CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "cpp")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server():
    if shutil.which("g++") is None:
        pytest.skip("no g++ toolchain")
    subprocess.run(["make", "-C", CPP_DIR], check=True, capture_output=True)
    port = _free_port()
    proc = subprocess.Popen(
        [os.path.join(CPP_DIR, "feature_store_server"),
         "--port", str(port), "--max-bytes", str(64 * 1024 * 1024)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    # wait for listen
    for _ in range(100):
        try:
            socket.create_connection(("127.0.0.1", port), timeout=0.2).close()
            break
        except OSError:
            time.sleep(0.05)
    else:
        proc.kill()
        pytest.fail("feature_store_server did not start")
    yield port
    proc.terminate()
    proc.wait(timeout=5)


def _tensors(rng, seq=16, h=8):
    return {
        "input_ids": rng.integers(0, 100, size=(seq,)).astype(np.int64),
        "hidden_state": rng.normal(size=(seq, 3 * h)).astype(ml_dtypes.bfloat16),
        "target": rng.normal(size=(seq, h)).astype(ml_dtypes.bfloat16),
    }


def test_put_fetch_release_roundtrip(server):
    store = NetworkFeatureStore(f"127.0.0.1:{server}")
    rng = np.random.default_rng(0)
    tensors = _tensors(rng)
    ref = store.put_sample("s0", tensors, {"target_repr": "hidden_state"})
    assert ref.features["hidden_state"].spec.dtype == "bfloat16"

    out = store.fetch(ref)
    for name in tensors:
        np.testing.assert_array_equal(
            np.asarray(out[name], np.float32),
            np.asarray(tensors[name], np.float32),
        )
    health = store.health()
    assert health["objects"] == 3 and health["puts"] == 3

    store.release_refs([ref])
    from specforge_tpu.runtime.data_plane.feature_store import (
        StaleReferenceError,
    )

    with pytest.raises(StaleReferenceError):
        store.fetch(ref)
    assert store.health()["objects"] == 0


def test_generation_staleness(server):
    store = NetworkFeatureStore(f"127.0.0.1:{server}", generation=0)
    rng = np.random.default_rng(1)
    ref = store.put_sample("gen0", _tensors(rng))
    # a restarted producer writes generation 1; old refs must not resolve
    store2 = NetworkFeatureStore(f"127.0.0.1:{server}", generation=1)
    from specforge_tpu.runtime.data_plane.feature_store import (
        StaleReferenceError,
    )

    fresh = store2.put_sample("gen0", _tensors(rng))
    assert fresh.features["target"].uri != ref.features["target"].uri
    out = store2.fetch(ref)  # old generation objects still resolvable by key
    assert out  # (until released) — staleness is enforced by key layout
    store.release_refs([ref])
    with pytest.raises(StaleReferenceError):
        store.fetch(ref)
    store2.release_refs([fresh])


def test_over_budget_put_raises(server):
    store = NetworkFeatureStore(f"127.0.0.1:{server}")
    with pytest.raises(MemoryError):
        store.put_sample(
            "huge", {"x": np.zeros(80 * 1024 * 1024 // 4, np.float32)}
        )


def test_adopt_builds_refs(server):
    from specforge_tpu.runtime.contracts import FeatureSpec

    store = NetworkFeatureStore(f"127.0.0.1:{server}")
    rng = np.random.default_rng(2)
    # simulate server-side capture: another client writes the object
    writer = NetworkFeatureStore(f"127.0.0.1:{server}")
    tensors = _tensors(rng)
    writer.put_sample("adopted", tensors)

    ref = store.adopt(
        "adopted",
        {
            name: FeatureSpec(
                name=name, shape=tuple(arr.shape),
                dtype="bfloat16" if arr.dtype == ml_dtypes.bfloat16 else "int64",
            )
            for name, arr in tensors.items()
        },
    )
    out = store.fetch(ref)
    np.testing.assert_array_equal(out["input_ids"], tensors["input_ids"])
    store.release_refs([ref])


def test_loader_through_network_store(server):
    import queue

    from specforge_tpu.data.collator import CollatorConfig, PaddingCollator
    from specforge_tpu.runtime.data_plane.feature_dataloader import (
        FeatureDataLoader,
    )

    store = NetworkFeatureStore(f"127.0.0.1:{server}")
    rng = np.random.default_rng(3)
    q = queue.Queue()
    for i in range(4):
        q.put(store.put_sample(f"n{i}", _tensors(rng)))
    q.put(None)
    loader = FeatureDataLoader(
        store, PaddingCollator(CollatorConfig(max_length=20)),
        ref_queue=q, batch_size=2, num_workers=2,
    )
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0].tensors["hidden_state"].shape == (2, 20, 24)


@pytest.fixture()
def secure_server():
    if shutil.which("g++") is None:
        pytest.skip("no g++ toolchain")
    subprocess.run(["make", "-C", CPP_DIR], check=True, capture_output=True)
    port = _free_port()
    proc = subprocess.Popen(
        [os.path.join(CPP_DIR, "feature_store_server"),
         "--port", str(port), "--secret", "hunter2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    for _ in range(100):
        try:
            socket.create_connection(("127.0.0.1", port), timeout=0.2).close()
            break
        except OSError:
            time.sleep(0.05)
    yield port
    proc.terminate()
    proc.wait(timeout=5)


def test_auth_required_and_enforced(secure_server):
    from specforge_tpu.runtime.data_plane.network_store import AuthError

    port = secure_server
    tensors = {"x": np.arange(8, dtype=np.float32)}

    # wrong secret: refused at connect
    with pytest.raises(AuthError):
        NetworkFeatureStore(
            f"127.0.0.1:{port}", secret="wrong"
        ).put_sample("s", tensors)
    # no secret: server replies auth-required on the first op
    with pytest.raises(Exception):
        NetworkFeatureStore(
            f"127.0.0.1:{port}", secret=None
        ).put_sample("s", tensors)
    # right secret: full roundtrip
    store = NetworkFeatureStore(f"127.0.0.1:{port}", secret="hunter2")
    ref = store.put_sample("s", tensors)
    out = store.fetch(ref)
    np.testing.assert_array_equal(out["x"], tensors["x"])


def test_pins_and_gc_sweep(server):
    store = NetworkFeatureStore(f"127.0.0.1:{server}", generation=7)
    ref = store.put_sample("pinme", {"x": np.ones(16, np.float32)})
    leaked = store.put_sample("leak", {"x": np.zeros(16, np.float32)})
    store.pin_refs([ref])

    # sweep with zero max-age removes unpinned objects (incl. the leak);
    # the shared module server may hold other unpinned leftovers
    removed = store.gc_sweep(0)
    assert removed >= 1
    assert store.fetch(ref)["x"].sum() == 16.0
    with pytest.raises(Exception):
        store.fetch(leaked)

    # release of a pinned ref unpins + deletes (lifetime authority)
    store.release_refs([ref])
    assert store.health()["objects"] == 0
    assert store.health()["pinned"] == 0


def test_fetch_into_preallocated(server):
    store = NetworkFeatureStore(f"127.0.0.1:{server}", generation=9)
    arr = np.arange(4096, dtype=np.float32).reshape(64, 64)
    bf = (np.arange(256).reshape(16, 16) % 7).astype(ml_dtypes.bfloat16)
    ref = store.put_sample("zc", {"a": arr, "b": bf})
    out_a = np.empty((64, 64), np.float32)
    out_b = np.empty((16, 16), ml_dtypes.bfloat16)
    store.fetch_feature_into(ref.features["a"], out_a)
    store.fetch_feature_into(ref.features["b"], out_b)
    np.testing.assert_array_equal(out_a, arr)
    np.testing.assert_array_equal(out_b, bf)
    store.release_refs([ref])


@pytest.mark.slow
def test_large_object_roundtrip_bounded_memory(server):
    """~512MB object: put from a memoryview, get into a preallocated buffer —
    client peak RSS stays under source+dest+slack (no whole-object copies,
    VERDICT W6 'done' criterion scaled to CI RAM)."""
    import resource

    n = int(os.environ.get("SPECFORGE_BIGOBJ_MB", "512")) * (1 << 20)
    src = np.random.default_rng(0).integers(
        0, 255, size=n, dtype=np.uint8
    ).view(np.uint8)
    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    store = NetworkFeatureStore(f"127.0.0.1:{server}", generation=11)
    # bump the budget? module server has 64MB cap: spin a dedicated server
    port = _free_port()
    proc = subprocess.Popen(
        [os.path.join(CPP_DIR, "feature_store_server"), "--port", str(port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        for _ in range(100):
            try:
                socket.create_connection(
                    ("127.0.0.1", port), timeout=0.2
                ).close()
                break
            except OSError:
                time.sleep(0.05)
        # generous socket timeout: a 512MB roundtrip under xdist CPU
        # oversubscription can exceed the 30s default on a loaded runner
        store = NetworkFeatureStore(f"127.0.0.1:{port}", timeout=300.0)
        ref = store.put_sample("big", {"x": src})
        dst = np.empty_like(src)
        store.fetch_feature_into(ref.features["x"], dst)
        assert np.array_equal(src[:1024], dst[:1024])
        assert np.array_equal(src[-1024:], dst[-1024:])
        rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
        # src + dst already live; extra transient must stay << object size
        extra = rss_after - rss_before - dst.nbytes
        assert extra < 0.25 * n, f"extra RSS {extra/1e6:.0f}MB"
        store.release_refs([ref])
    finally:
        proc.terminate()
        proc.wait(timeout=5)
