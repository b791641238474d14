"""FeatureDataLoader: refs → materialize → collate → TrainBatch.

Mirrors the reference loader contract (feature_dataloader.py:92-507):

- source is either a re-iterable list of refs (offline; supports ``seek``) or a
  consume-once queue (streaming);
- materialization (store fetch + per-sample transform) runs on background
  threads with *ordered* handoff so training sees a deterministic sequence;
- incomplete final batches are dropped (``drop_last``) or yielded short.

Device placement is left to the caller (the trainer device_puts the collated
host batch with the mesh sharding) so the loader stays jax-free and testable.
"""

from __future__ import annotations

import queue as queue_mod
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from specforge_tpu.runtime.contracts import SampleRef, TrainBatch
from specforge_tpu.runtime.data_plane.feature_store import FeatureStore

Transform = Callable[[Dict[str, np.ndarray], SampleRef], Dict[str, np.ndarray]]
Collate = Callable[..., TrainBatch]


class FeatureDataLoader:
    def __init__(
        self,
        store: FeatureStore,
        collate: Collate,
        *,
        refs: Optional[Sequence[SampleRef]] = None,
        ref_queue: Optional["queue_mod.Queue"] = None,
        batch_size: int = 1,
        transform: Optional[Transform] = None,
        num_workers: int = 2,
        drop_last: bool = True,
        prefetch_batches: int = 2,
        metadata: Optional[Dict[str, Any]] = None,
    ) -> None:
        if (refs is None) == (ref_queue is None):
            raise ValueError("provide exactly one of refs / ref_queue")
        self.store = store
        self.collate = collate
        self.refs = list(refs) if refs is not None else None
        self.ref_queue = ref_queue
        self.batch_size = batch_size
        self.transform = transform
        self.num_workers = max(0, num_workers)
        self.drop_last = drop_last
        self.prefetch_batches = max(1, prefetch_batches)
        self.metadata = dict(metadata or {})
        self._start_index = 0  # in samples (seek/resume support)

    # --- resume ---------------------------------------------------------
    @property
    def supports_seek(self) -> bool:
        return self.refs is not None

    def seek(self, samples_consumed: int) -> None:
        """Position the next epoch pass after ``samples_consumed`` samples —
        batch-size-independent mid-epoch resume (controller contract)."""
        if self.refs is None:
            raise ValueError("seek is only supported in refs (offline) mode")
        self._start_index = samples_consumed % max(len(self.refs), 1)

    def __len__(self) -> int:
        if self.refs is None:
            raise TypeError("streaming loader has no length")
        n = len(self.refs) - self._start_index
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    # --- iteration ------------------------------------------------------
    def _ref_stream(self) -> Iterator[SampleRef]:
        if self.refs is not None:
            yield from self.refs[self._start_index:]
            return
        while True:
            item = self.ref_queue.get()
            if item is None:  # sentinel: stream closed
                return
            yield item

    def _materialize(self, ref: SampleRef) -> Dict[str, np.ndarray]:
        tensors = self.store.fetch(ref)
        if self.transform is not None:
            tensors = self.transform(tensors, ref)
        return tensors

    def _batched_refs(self) -> Iterator[List[SampleRef]]:
        buf: List[SampleRef] = []
        for ref in self._ref_stream():
            buf.append(ref)
            if len(buf) == self.batch_size:
                yield buf
                buf = []
        if buf and not self.drop_last:
            yield buf

    def __iter__(self) -> Iterator[TrainBatch]:
        if self.num_workers == 0:
            for ref_batch in self._batched_refs():
                yield self._collate_batch(
                    ref_batch, [self._materialize(r) for r in ref_batch]
                )
            return

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending: "queue_mod.Queue" = queue_mod.Queue()
            window = self.prefetch_batches
            it = self._batched_refs()
            in_flight = 0
            done = False

            def submit_next() -> bool:
                nonlocal done
                try:
                    ref_batch = next(it)
                except StopIteration:
                    done = True
                    return False
                futures = [pool.submit(self._materialize, r) for r in ref_batch]
                pending.put((ref_batch, futures))
                return True

            while not done and in_flight < window:
                if submit_next():
                    in_flight += 1
            while in_flight:
                ref_batch, futures = pending.get()
                samples = [f.result() for f in futures]
                in_flight -= 1
                if not done and submit_next():
                    in_flight += 1
                yield self._collate_batch(ref_batch, samples)

    def _collate_batch(self, ref_batch, samples) -> TrainBatch:
        metadata = dict(self.metadata)
        for ref in ref_batch:
            metadata.update(
                {k: v for k, v in ref.metadata.items() if k not in metadata}
            )
        return self.collate(
            samples,
            sample_ids=[r.sample_id for r in ref_batch],
            metadata=metadata,
        )
