"""Feature stores: the tensor plane.

Same contract family as the reference stores (feature_store.py:110-660,
data_plane/disaggregated.py:52-374):

- :class:`InMemoryFeatureStore` — producer-side staging: leases, generation
  tags in URIs (stale refs rejected after producer restart), resident-byte
  accounting with a loud MemoryError above ``max_resident_bytes`` (backpressure
  is the flow controller's job, the store only refuses), consume-once or
  explicit release.
- :class:`FileFeatureStore` — read-only ``file://`` mode over offline capture
  files (.sft native / reference .ckpt[.gz]).
- :class:`SharedDirFeatureStore` — cross-process shared-POSIX-dir backend:
  per-generation files published by atomic rename; release deletes.

All stores speak numpy on the host; device transfer happens in the dataloader
(jax.device_put of the collated batch).
"""

from __future__ import annotations

import abc
import os
import threading
from typing import Any, Dict, Iterable, Mapping, Optional, Tuple
from urllib.parse import urlparse

import numpy as np

from specforge_tpu.runtime.contracts import FeatureHandle, FeatureSpec, SampleRef
from specforge_tpu.runtime.data_plane.feature_file import (
    dtype_name,
    load_feature_file,
    read_feature_specs,
    save_feature_file,
)


class StoreError(RuntimeError):
    pass


class StaleReferenceError(StoreError):
    """The handle's generation does not match the store's current generation."""


class FeatureStore(abc.ABC):
    """put → handles; fetch by ref; release frees. Metadata-only callers hold
    SampleRefs; tensors only cross this boundary."""

    @abc.abstractmethod
    def put_sample(
        self,
        sample_id: str,
        tensors: Mapping[str, np.ndarray],
        metadata: Optional[Mapping[str, Any]] = None,
    ) -> SampleRef: ...

    @abc.abstractmethod
    def fetch(self, ref: SampleRef) -> Dict[str, np.ndarray]: ...

    @abc.abstractmethod
    def release(self, sample_ids: Iterable[str]) -> None: ...

    def abort(self, sample_id: str) -> None:
        self.release([sample_id])

    @abc.abstractmethod
    def health(self) -> Dict[str, Any]: ...


def _spec_of(name: str, arr: np.ndarray) -> FeatureSpec:
    return FeatureSpec(name=name, shape=tuple(arr.shape), dtype=dtype_name(arr.dtype))


class InMemoryFeatureStore(FeatureStore):
    def __init__(
        self,
        *,
        max_resident_bytes: Optional[int] = None,
        clone_on_fetch: bool = True,
        consume_once: bool = False,
        generation: int = 0,
    ) -> None:
        self._lock = threading.Lock()
        self._data: Dict[str, Dict[str, np.ndarray]] = {}
        self._meta: Dict[str, Dict[str, Any]] = {}
        self._bytes: Dict[str, int] = {}
        self.resident_bytes = 0
        self.max_resident_bytes = max_resident_bytes
        self.clone_on_fetch = clone_on_fetch
        self.consume_once = consume_once
        self.generation = generation
        self._put_count = 0
        self._fetch_count = 0
        self._release_count = 0
        self._touched: Dict[str, float] = {}
        self._pinned: set = set()

    def put_sample(self, sample_id, tensors, metadata=None) -> SampleRef:
        nbytes = sum(int(a.nbytes) for a in tensors.values())
        with self._lock:
            if sample_id in self._data:
                # idempotent re-put of the same sample id is a no-op
                pass
            else:
                if (
                    self.max_resident_bytes is not None
                    and self.resident_bytes + nbytes > self.max_resident_bytes
                ):
                    raise MemoryError(
                        f"feature store over budget: resident={self.resident_bytes} "
                        f"+ incoming={nbytes} > max={self.max_resident_bytes}; "
                        "producer flow control should have paused upstream"
                    )
                self._data[sample_id] = {
                    k: np.ascontiguousarray(v) for k, v in tensors.items()
                }
                self._meta[sample_id] = dict(metadata or {})
                self._bytes[sample_id] = nbytes
                self.resident_bytes += nbytes
                self._put_count += 1
            import time as _time

            self._touched[sample_id] = _time.monotonic()
        features = {
            name: FeatureHandle(
                uri=f"mem://{sample_id}/{name}.g{self.generation}",
                spec=_spec_of(name, arr),
            )
            for name, arr in tensors.items()
        }
        return SampleRef(
            sample_id=sample_id, features=features, metadata=dict(metadata or {})
        )

    def _check_generation(self, handle: FeatureHandle) -> None:
        uri = handle.uri
        gen_part = uri.rsplit(".g", 1)
        if len(gen_part) == 2 and gen_part[1].isdigit():
            if int(gen_part[1]) != self.generation:
                raise StaleReferenceError(
                    f"stale handle {uri} (store generation {self.generation})"
                )

    def fetch(self, ref: SampleRef) -> Dict[str, np.ndarray]:
        for handle in ref.features.values():
            self._check_generation(handle)
        with self._lock:
            if ref.sample_id not in self._data:
                raise KeyError(f"sample {ref.sample_id} not in store")
            tensors = self._data[ref.sample_id]
            out = (
                {k: v.copy() for k, v in tensors.items()}
                if self.clone_on_fetch
                else dict(tensors)
            )
            self._fetch_count += 1
            import time as _time

            self._touched[ref.sample_id] = _time.monotonic()
            if self.consume_once:
                self._free_locked(ref.sample_id)
        return out

    def _free_locked(self, sample_id: str) -> None:
        if sample_id in self._data:
            self.resident_bytes -= self._bytes.pop(sample_id, 0)
            del self._data[sample_id]
            self._meta.pop(sample_id, None)
            self._touched.pop(sample_id, None)
            self._pinned.discard(sample_id)
            self._release_count += 1

    def release(self, sample_ids: Iterable[str]) -> None:
        with self._lock:
            for sid in sample_ids:
                self._free_locked(sid)

    # --- pin / max-hold GC (reference lease + max-hold sweep contract,
    # runtime/data_plane/feature_store.py:110-660) -------------------------
    def pin(self, sample_ids: Iterable[str]) -> None:
        with self._lock:
            self._pinned.update(sample_ids)

    def unpin(self, sample_ids: Iterable[str]) -> None:
        with self._lock:
            self._pinned.difference_update(sample_ids)

    def gc_sweep(self, max_age_seconds: float) -> int:
        """Free UNPINNED samples untouched (no put/fetch) for longer than
        ``max_age_seconds`` — leaked puts from crashed producers."""
        import time as _time

        cutoff = _time.monotonic() - max_age_seconds
        removed = 0
        with self._lock:
            for sid in list(self._data):
                if sid in self._pinned:
                    continue
                if self._touched.get(sid, 0.0) <= cutoff:
                    self._free_locked(sid)
                    removed += 1
        return removed

    def health(self) -> Dict[str, Any]:
        with self._lock:
            return {
                "backend": "memory",
                "resident_bytes": self.resident_bytes,
                "resident_samples": len(self._data),
                "puts": self._put_count,
                "fetches": self._fetch_count,
                "releases": self._release_count,
                "generation": self.generation,
            }


class FileFeatureStore(FeatureStore):
    """Read-only store over existing capture files (offline training)."""

    def __init__(self) -> None:
        self._fetch_count = 0

    def put_sample(self, sample_id, tensors, metadata=None) -> SampleRef:
        raise StoreError("FileFeatureStore is read-only")

    @staticmethod
    def ref_for_file(
        path: str,
        sample_id: Optional[str] = None,
        *,
        read_specs: bool = False,
        epoch: int = 0,
    ) -> SampleRef:
        """A lazy SampleRef for one capture file.

        By default the tensor bytes AND header are untouched (startup-cost
        contract of the reference OfflineManifestReader: refs must be cheap);
        specs carry placeholder shapes unless ``read_specs`` (safetensors
        header read — still cheap, but O(files) syscalls).
        """
        path = os.path.abspath(path)
        if sample_id is None:
            base = os.path.basename(path)
            for suffix in (".sft", ".ckpt.gz", ".ckpt"):
                if base.endswith(suffix):
                    base = base[: -len(suffix)]
                    break
            sample_id = base
        metadata: Dict[str, Any] = {}
        if read_specs and path.endswith(".sft"):
            specs, meta = read_feature_specs(path)
            metadata.update(meta)
            features = {
                name: FeatureHandle(uri=f"file://{path}#{name}", spec=spec)
                for name, spec in specs.items()
            }
        else:
            features = {
                "__file__": FeatureHandle(
                    uri=f"file://{path}",
                    spec=FeatureSpec(name="__file__", shape=(), dtype="uint8"),
                )
            }
        return SampleRef(
            sample_id=sample_id, features=features, epoch=epoch,
            metadata=metadata,
        )

    def fetch(self, ref: SampleRef) -> Dict[str, np.ndarray]:
        handle = next(iter(ref.features.values()))
        parsed = urlparse(handle.uri)
        if parsed.scheme != "file":
            raise StoreError(f"FileFeatureStore got non-file uri {handle.uri}")
        path = parsed.path
        tensors, _meta = load_feature_file(path)
        self._fetch_count += 1
        return tensors

    def release(self, sample_ids: Iterable[str]) -> None:
        pass  # read-only: offline files outlive training

    def health(self) -> Dict[str, Any]:
        return {"backend": "file", "fetches": self._fetch_count}


class SharedDirFeatureStore(FeatureStore):
    """Cross-process store over a shared POSIX directory.

    Producer publishes `{sample_id}.g{gen}.sft` by atomic rename; consumers
    fetch by ref; durable-ack release deletes the file. Generation in the
    filename rejects refs from a dead producer's previous life.
    """

    def __init__(self, root: str, *, generation: int = 0) -> None:
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self.generation = generation
        self._put_count = 0
        self._fetch_count = 0
        self._release_count = 0

    def _path(self, sample_id: str, generation: Optional[int] = None) -> str:
        gen = self.generation if generation is None else generation
        return os.path.join(self.root, f"{sample_id}.g{gen}.sft")

    def put_sample(self, sample_id, tensors, metadata=None) -> SampleRef:
        path = self._path(sample_id)
        save_feature_file(
            path, tensors,
            {k: str(v) for k, v in (metadata or {}).items()},
        )
        self._put_count += 1
        features = {
            name: FeatureHandle(
                uri=f"file://{path}#{name}", spec=_spec_of(name, arr)
            )
            for name, arr in tensors.items()
        }
        return SampleRef(
            sample_id=sample_id, features=features, metadata=dict(metadata or {})
        )

    def fetch(self, ref: SampleRef) -> Dict[str, np.ndarray]:
        path = self._path(ref.sample_id)
        if not os.path.exists(path):
            # fall back to the uri's path (ref may carry another generation)
            handle = next(iter(ref.features.values()))
            path = urlparse(handle.uri).path
            if not os.path.exists(path):
                raise StaleReferenceError(
                    f"sample {ref.sample_id} not present in {self.root}"
                )
        tensors, _ = load_feature_file(path)
        self._fetch_count += 1
        return tensors

    def release(self, sample_ids: Iterable[str]) -> None:
        for sid in sample_ids:
            try:
                os.remove(self._path(sid))
                self._release_count += 1
            except FileNotFoundError:
                pass

    def health(self) -> Dict[str, Any]:
        return {
            "backend": "shared_dir",
            "root": self.root,
            "resident_samples": len(
                [n for n in os.listdir(self.root) if n.endswith(".sft")]
            ),
            "puts": self._put_count,
            "fetches": self._fetch_count,
            "releases": self._release_count,
            "generation": self.generation,
        }
