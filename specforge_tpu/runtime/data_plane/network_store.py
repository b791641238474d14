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


class _Connection:
    def __init__(self, host: str, port: int, timeout: float):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

    def request(self, op: bytes, key: str, payload: bytes = b"") -> Tuple[int, bytes]:
        key_b = key.encode()
        header = op + struct.pack("<I", len(key_b)) + key_b + struct.pack(
            "<Q", len(payload)
        )
        self.sock.sendall(header + payload)
        status_len = self._read_exact(9)
        status = status_len[0:1]
        (resp_len,) = struct.unpack("<Q", status_len[1:9])
        body = self._read_exact(resp_len) if resp_len else b""
        return int(status.decode()), body

    def _read_exact(self, n: int) -> bytes:
        chunks = []
        remaining = n
        while remaining:
            chunk = self.sock.recv(min(remaining, 1 << 20))
            if not chunk:
                raise ConnectionError("feature store connection closed")
            chunks.append(chunk)
            remaining -= len(chunk)
        return b"".join(chunks)

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
    ) -> None:
        host, _, port = endpoint.rpartition(":")
        self.host, self.port = host or "127.0.0.1", int(port)
        self.timeout = timeout
        self.generation = generation
        self._local = threading.local()
        self._pending_removals: List[str] = []
        self._pending_lock = threading.Lock()
        self._adopted_bytes = 0

    def _conn(self) -> _Connection:
        conn = getattr(self._local, "conn", None)
        if conn is None:
            conn = _Connection(self.host, self.port, self.timeout)
            self._local.conn = conn
        return conn

    def _key(self, sample_id: str, name: str, generation=None) -> str:
        gen = self.generation if generation is None else generation
        return f"{sample_id}/{name}.g{gen}"

    # --- FeatureStore contract -------------------------------------------
    def put_sample(self, sample_id, tensors: Mapping[str, np.ndarray],
                   metadata=None) -> SampleRef:
        conn = self._conn()
        features: Dict[str, FeatureHandle] = {}
        for name, arr in tensors.items():
            arr = np.ascontiguousarray(arr)
            key = self._key(sample_id, name)
            status, _ = conn.request(b"P", key, arr.tobytes())
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
        conn = self._conn()
        out: Dict[str, np.ndarray] = {}
        for name, handle in ref.features.items():
            key = handle.uri.split("/", 3)[3]  # net://host:port/<key>
            status, body = conn.request(b"G", key)
            if status == 1:
                raise StaleReferenceError(
                    f"object {key} not in store (released or stale generation)"
                )
            if status != 0:
                raise StoreError(f"get {key} failed with status {status}")
            spec = handle.spec
            arr = np.frombuffer(body, dtype=_NP_DTYPES[spec.dtype])
            out[name] = arr.reshape(spec.shape)
        return out

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
                    conn.request(b"D", key)
                except (OSError, ConnectionError):
                    with self._pending_lock:
                        self._pending_removals.append(key)

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
