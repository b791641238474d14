"""C++ store fan-in hardening: protocol faults + concurrency soak.

Drives the fault paths the reference's Mooncake layer is hardened for
(mooncake_store.py:47-55 lock discipline, _release_pending retry):
truncated frames, wrong auth mid-stream, slow consumers stalling response
writes, and many-client fan-in against the connection cap — all while
healthy clients must keep working.
"""

import json
import os
import shutil
import socket
import struct
import subprocess
import threading
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


def _spawn(extra_args):
    if shutil.which("g++") is None:
        pytest.skip("no g++ toolchain")
    subprocess.run(["make", "-C", CPP_DIR], check=True, capture_output=True)
    port = _free_port()
    proc = subprocess.Popen(
        [os.path.join(CPP_DIR, "feature_store_server"),
         "--port", str(port), *extra_args],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    for _ in range(100):
        try:
            socket.create_connection(("127.0.0.1", port), timeout=0.2).close()
            break
        except OSError:
            time.sleep(0.05)
    else:
        proc.kill()
        pytest.fail("feature_store_server did not start")
    return proc, port


def _stats(port):
    store = NetworkFeatureStore(f"127.0.0.1:{port}")
    try:
        return store.health()
    finally:
        store.close()


def _tensors(rng, seq=16, h=8):
    return {
        "input_ids": rng.integers(0, 100, size=(seq,)).astype(np.int64),
        "hidden_state": rng.normal(size=(seq, h)).astype(ml_dtypes.bfloat16),
    }


@pytest.fixture()
def fault_server():
    proc, port = _spawn([
        "--max-bytes", str(256 * 1024 * 1024),
        "--frame-timeout-seconds", "1",
        "--max-connections", "4",
    ])
    yield port
    proc.terminate()
    proc.wait(timeout=5)


def test_truncated_frame_dropped_server_stays_healthy(fault_server):
    """A peer that sends half a frame and stalls is dropped by the frame
    timeout; a healthy client keeps working throughout."""
    port = fault_server
    bad = socket.create_connection(("127.0.0.1", port))
    # op 'P' + key_len claiming 16 bytes, then send only 3 and stall
    bad.sendall(b"P" + struct.pack("<I", 16) + b"abc")

    rng = np.random.default_rng(0)
    store = NetworkFeatureStore(f"127.0.0.1:{port}")
    ref = store.put_sample("s1", _tensors(rng))
    got = store.fetch(ref)
    assert got["input_ids"].shape == (16,)

    # frame timeout is 1 s: the stalled peer must be dropped and counted
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        if store.health().get("timeouts", 0) >= 1:
            break
        time.sleep(0.2)
    health = store.health()
    store.close()
    bad.close()
    assert health["timeouts"] >= 1, health


def test_half_header_then_disconnect(fault_server):
    """Abrupt disconnects mid-header must not wedge the server."""
    port = fault_server
    for payload in (b"P", b"P\x10", b"G" + struct.pack("<I", 4) + b"ab"):
        s = socket.create_connection(("127.0.0.1", port))
        s.sendall(payload)
        s.close()
    rng = np.random.default_rng(1)
    store = NetworkFeatureStore(f"127.0.0.1:{port}")
    ref = store.put_sample("s2", _tensors(rng))
    assert store.fetch(ref)["input_ids"].shape == (16,)
    store.close()


def test_slow_consumer_write_stall_dropped(fault_server):
    """A GET reader that stops reading stalls the server's response write;
    the send timeout must drop it instead of pinning the thread."""
    port = fault_server
    rng = np.random.default_rng(2)
    big = {"blob": rng.integers(0, 255, size=(48 * 1024 * 1024,)).astype(
        np.uint8)}
    store = NetworkFeatureStore(f"127.0.0.1:{port}")
    ref = store.put_sample("big", big)
    key = "big/blob.g0"  # store generation defaults to 0

    slow = socket.socket()
    slow.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4096)
    slow.connect(("127.0.0.1", port))
    slow.sendall(b"G" + struct.pack("<I", len(key)) + key.encode()
                 + struct.pack("<Q", 0))
    slow.recv(16)  # read the header, then stall — never drain the payload

    deadline = time.monotonic() + 15
    dropped = False
    while time.monotonic() < deadline:
        if store.health().get("timeouts", 0) >= 1:
            dropped = True
            break
        time.sleep(0.3)
    # healthy client still served while/after the stall
    got = store.fetch(ref)
    assert got["blob"].nbytes == big["blob"].nbytes
    store.close()
    slow.close()
    assert dropped


def test_connection_cap_backpressure_soak(fault_server):
    """12 concurrent workers against --max-connections 4: every op must
    complete (queued at accept, never refused) with faults injected
    alongside."""
    port = fault_server
    errors = []

    def worker(wid):
        try:
            rng = np.random.default_rng(wid)
            store = NetworkFeatureStore(f"127.0.0.1:{port}")
            for i in range(6):
                sid = f"w{wid}-{i}"
                ref = store.put_sample(sid, _tensors(rng))
                got = store.fetch(ref)
                assert got["hidden_state"].shape == (16, 8)
                store.release_refs([ref])
            store.close()
        except Exception as exc:  # noqa: BLE001
            errors.append((wid, repr(exc)))

    def fault_injector(n):
        for _ in range(n):
            try:
                s = socket.create_connection(("127.0.0.1", port),
                                             timeout=5)
                s.sendall(b"P" + struct.pack("<I", 8) + b"hi")
                s.close()
            except OSError:
                pass

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(12)]
    threads.append(threading.Thread(target=fault_injector, args=(5,)))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "soak worker hung"
    assert not errors, errors
    health = _stats(port)
    assert health["max_connections"] == 4
    assert health["puts"] >= 72


def test_wrong_auth_mid_stream_dropped():
    """On a secured server: wrong secret is refused and dropped; a good
    client authenticates and works; garbage ops after auth drop the
    connection without corrupting the store."""
    proc, port = _spawn(["--secret", "sesame"])
    try:
        # wrong secret
        s = socket.create_connection(("127.0.0.1", port))
        s.sendall(b"A" + struct.pack("<I", 0) + struct.pack("<Q", 5)
                  + b"wrong")
        status = s.recv(9)
        assert status[:1] == b"4"
        s.close()

        os.environ["SPECFORGE_STORE_SECRET"] = "sesame"
        try:
            rng = np.random.default_rng(3)
            store = NetworkFeatureStore(f"127.0.0.1:{port}")
            ref = store.put_sample("sec1", _tensors(rng))

            # authenticated connection that then sends a garbage op
            g = socket.create_connection(("127.0.0.1", port))
            g.sendall(b"A" + struct.pack("<I", 0) + struct.pack("<Q", 6)
                      + b"sesame")
            assert g.recv(9)[:1] == b"0"
            g.sendall(b"Z" + struct.pack("<I", 0) + struct.pack("<Q", 0))
            assert g.recv(9)[:1] == b"3"  # refused, connection dropped
            g.close()

            # store still intact
            assert store.fetch(ref)["input_ids"].shape == (16,)
            store.close()
        finally:
            del os.environ["SPECFORGE_STORE_SECRET"]
    finally:
        proc.terminate()
        proc.wait(timeout=5)
