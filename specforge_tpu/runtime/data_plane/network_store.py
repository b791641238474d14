"""Network feature store client — the DCN tensor plane.

Talks the length-prefixed binary protocol of ``cpp/feature_store_server``
(the Mooncake-equivalent host-RAM object store; see the server source for the
wire format). Matches the reference Mooncake client semantics
(mooncake_store.py:161-860): raw-buffer puts with shape/dtype carried by the
SampleRef (never serialized blobs), hard-pinned objects with the trainer as
lifetime authority, retryable removals (``drain_pending_removals``), and
``adopt()`` for server-side-written capture objects.

Object key layout: ``{sample_id}/{feature_name}.g{generation}``.
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Any, Dict, Iterable, List, Mapping, Optional, Tuple

import ml_dtypes
import numpy as np

from specforge_tpu.runtime.contracts import FeatureHandle, FeatureSpec, SampleRef
from specforge_tpu.runtime.data_plane.feature_file import dtype_name
from specforge_tpu.runtime.data_plane.feature_store import (
    FeatureStore,
    StaleReferenceError,
    StoreError,
)

_NP_DTYPES = {
    "bfloat16": np.dtype(ml_dtypes.bfloat16),
    "float32": np.dtype(np.float32),
    "float16": np.dtype(np.float16),
    "float64": np.dtype(np.float64),
    "int64": np.dtype(np.int64),
    "int32": np.dtype(np.int32),
    "int16": np.dtype(np.int16),
    "int8": np.dtype(np.int8),
    "uint8": np.dtype(np.uint8),
    "uint16": np.dtype(np.uint16),
    "uint32": np.dtype(np.uint32),
    "bool": np.dtype(np.bool_),
}


class AuthError(StoreError):
    pass


class _Connection:
    def __init__(self, host: str, port: int, timeout: float,
                 secret: Optional[str] = None):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        if secret:
            status, _ = self.request(b"A", "", secret.encode())
            if status != 0:
                raise AuthError("feature store rejected the shared secret")

    def _send_request(self, op: bytes, key: str, payload) -> None:
        key_b = key.encode()
        header = op + struct.pack("<I", len(key_b)) + key_b + struct.pack(
            "<Q", len(payload) if payload is not None else 0
        )
        self.sock.sendall(header)
        if payload is not None and len(payload):
            # memoryview path: no intermediate bytes copy for large tensors
            self.sock.sendall(payload)

    def request(self, op: bytes, key: str, payload=b"") -> Tuple[int, bytes]:
        self._send_request(op, key, payload)
        status, resp_len = self._read_header()
        body = self._read_exact(resp_len) if resp_len else b""
        return status, body

    def request_into(self, op: bytes, key: str, out: memoryview) -> int:
        """GET streaming the response directly into a preallocated buffer
        (zero-copy client side — the reference get_into contract)."""
        self._send_request(op, key, None)
        status, resp_len = self._read_header()
        if status != 0:
            if resp_len:
                self._read_exact(resp_len)
            return status
        if resp_len != len(out):
            # drain to keep the connection sane, then fail loudly
            self._read_exact(resp_len)
            raise StoreError(
                f"object {key}: size {resp_len} != buffer {len(out)}"
            )
        self._read_exact_into(out)
        return status

    def _read_header(self) -> Tuple[int, int]:
        status_len = self._read_exact(9)
        (resp_len,) = struct.unpack("<Q", status_len[1:9])
        return int(status_len[0:1].decode()), resp_len

    def _read_exact(self, n: int) -> bytes:
        buf = bytearray(n)
        self._read_exact_into(memoryview(buf))
        return bytes(buf)

    def _read_exact_into(self, view: memoryview) -> None:
        remaining = len(view)
        offset = 0
        while remaining:
            r = self.sock.recv_into(view[offset:], remaining)
            if r <= 0:
                raise ConnectionError("feature store connection closed")
            offset += r
            remaining -= r

    def close(self):
        try:
            self.sock.sendall(b"Q")
        except OSError:
            pass
        self.sock.close()


class NetworkFeatureStore(FeatureStore):
    def __init__(
        self,
        endpoint: str,
        *,
        generation: int = 0,
        timeout: float = 30.0,
        secret: Optional[str] = None,
    ) -> None:
        import os

        host, _, port = endpoint.rpartition(":")
        self.host, self.port = host or "127.0.0.1", int(port)
        self.timeout = timeout
        self.generation = generation
        self.secret = (
            secret
            if secret is not None
            else os.environ.get("SPECFORGE_STORE_SECRET")
        )
        self._local = threading.local()
        self._pending_removals: List[str] = []
        self._pending_lock = threading.Lock()
        self._adopted_bytes = 0

    def _conn(self) -> _Connection:
        conn = getattr(self._local, "conn", None)
        if conn is None:
            conn = _Connection(
                self.host, self.port, self.timeout, secret=self.secret
            )
            self._local.conn = conn
        return conn

    def _key(self, sample_id: str, name: str, generation=None) -> str:
        gen = self.generation if generation is None else generation
        return f"{sample_id}/{name}.g{gen}"

    # --- FeatureStore contract -------------------------------------------
    @staticmethod
    def _byte_view(arr: np.ndarray) -> memoryview:
        """Raw-byte view of any-dtype contiguous array (bf16 included) —
        no tobytes() copy on the put path."""
        return memoryview(arr.reshape(-1).view(np.uint8))

    def put_sample(self, sample_id, tensors: Mapping[str, np.ndarray],
                   metadata=None) -> SampleRef:
        conn = self._conn()
        features: Dict[str, FeatureHandle] = {}
        for name, arr in tensors.items():
            arr = np.ascontiguousarray(arr)
            key = self._key(sample_id, name)
            status, _ = conn.request(b"P", key, self._byte_view(arr))
            if status == 2:
                raise MemoryError(
                    f"network feature store over budget putting {key}; "
                    "producer flow control should have paused upstream"
                )
            if status != 0:
                raise StoreError(f"put {key} failed with status {status}")
            features[name] = FeatureHandle(
                uri=f"net://{self.host}:{self.port}/{key}",
                spec=FeatureSpec(
                    name=name, shape=tuple(arr.shape),
                    dtype=dtype_name(arr.dtype),
                ),
            )
        return SampleRef(
            sample_id=sample_id, features=features,
            metadata=dict(metadata or {}),
        )

    def fetch(self, ref: SampleRef) -> Dict[str, np.ndarray]:
        """GET each feature straight into a freshly allocated array of its
        final shape/dtype (recv_into — no intermediate bytes buffer)."""
        out: Dict[str, np.ndarray] = {}
        for name, handle in ref.features.items():
            arr = np.empty(
                handle.spec.shape, dtype=_NP_DTYPES[handle.spec.dtype]
            )
            self.fetch_feature_into(handle, arr)
            out[name] = arr
        return out

    def fetch_feature_into(self, handle: FeatureHandle,
                           out: np.ndarray) -> None:
        """get_into contract: stream one object into a preallocated buffer
        (reference mooncake get_into, mooncake_store.py:161-860)."""
        conn = self._conn()
        key = handle.uri.split("/", 3)[3]  # net://host:port/<key>
        status = conn.request_into(b"G", key, self._byte_view(out))
        if status == 1:
            raise StaleReferenceError(
                f"object {key} not in store (released or stale generation)"
            )
        if status != 0:
            raise StoreError(f"get {key} failed with status {status}")

    def release(self, sample_ids: Iterable[str]) -> None:
        # feature names aren't known from ids alone; store full-key removals
        # via release_refs. id-only release is a no-op here by design.
        raise StoreError(
            "NetworkFeatureStore requires release_refs(refs) — object keys "
            "carry feature names"
        )

    def release_refs(self, refs: Iterable[SampleRef]) -> None:
        conn = self._conn()
        for ref in refs:
            for handle in ref.features.values():
                key = "/".join(handle.uri.split("/", 3)[3:])
                try:
                    status, _ = conn.request(b"D", key)
                    # pinned: the lifetime authority unpins until removable
                    # (pin counts can exceed 1 after crash-readopt cycles)
                    attempts = 0
                    while status == 5 and attempts < 64:
                        conn.request(b"U", key)
                        status, _ = conn.request(b"D", key)
                        attempts += 1
                    if status == 5:
                        with self._pending_lock:
                            self._pending_removals.append(key)
                except (OSError, ConnectionError):
                    with self._pending_lock:
                        self._pending_removals.append(key)

    # --- pin accounting / GC (reference max-hold + hard-pin contract,
    # feature_store.py:110-660) --------------------------------------------
    def pin_refs(self, refs: Iterable[SampleRef]) -> None:
        conn = self._conn()
        for ref in refs:
            for handle in ref.features.values():
                key = "/".join(handle.uri.split("/", 3)[3:])
                conn.request(b"I", key)

    def unpin_refs(self, refs: Iterable[SampleRef]) -> None:
        conn = self._conn()
        for ref in refs:
            for handle in ref.features.values():
                key = "/".join(handle.uri.split("/", 3)[3:])
                conn.request(b"U", key)

    def gc_sweep(self, max_age_seconds: int) -> int:
        """Server-side max-hold sweep: delete UNPINNED objects untouched for
        longer than ``max_age_seconds`` (leaked puts from crashed
        producers); returns the number removed."""
        import json

        status, body = self._conn().request(
            b"C", "", struct.pack("<Q", int(max_age_seconds))
        )
        if status != 0:
            raise StoreError(f"gc sweep failed with status {status}")
        return int(json.loads(body.decode())["removed"])

    def drain_pending_removals(self) -> int:
        """Retry removals that failed on a dead connection."""
        with self._pending_lock:
            pending, self._pending_removals = self._pending_removals, []
        self._local.conn = None  # force reconnect
        conn = self._conn()
        failed = []
        for key in pending:
            try:
                conn.request(b"D", key)
            except (OSError, ConnectionError):
                failed.append(key)
        with self._pending_lock:
            self._pending_removals.extend(failed)
        return len(pending) - len(failed)

    def adopt(self, sample_id: str, specs: Mapping[str, FeatureSpec],
              metadata=None) -> SampleRef:
        """Build a ref for objects a capture server already wrote directly
        into the store (the zero-copy server-side capture path)."""
        features = {
            name: FeatureHandle(
                uri=f"net://{self.host}:{self.port}/"
                    f"{self._key(sample_id, name)}",
                spec=spec,
            )
            for name, spec in specs.items()
        }
        ref = SampleRef(
            sample_id=sample_id, features=features,
            metadata=dict(metadata or {}),
        )
        self._adopted_bytes += ref.nbytes
        # claiming adoption hard-pins the objects: the trainer is now the
        # lifetime authority and the max-hold GC sweep must skip them
        try:
            self.pin_refs([ref])
        except (OSError, ConnectionError, StoreError):
            pass  # pin is protective, not required for correctness
        return ref

    def health(self) -> Dict[str, Any]:
        import json

        status, body = self._conn().request(b"S", "")
        if status != 0:
            return {"backend": "network", "error": f"stat status {status}"}
        out = json.loads(body.decode())
        out["backend"] = "network"
        out["endpoint"] = f"{self.host}:{self.port}"
        with self._pending_lock:
            out["pending_removals"] = len(self._pending_removals)
        return out

    def close(self):
        conn = getattr(self._local, "conn", None)
        if conn is not None:
            conn.close()
            self._local.conn = None
