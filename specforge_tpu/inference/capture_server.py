"""Online capture server: a JAX target-model HTTP service with ``spec_capture``.

The TPU-native replacement for the patched SGLang capture server
(patches/sglang/spec-capture.patch in the reference, SURVEY §2.7): a serving
host runs the frozen target's prefill and captures training features during it.
With a ``spec_capture`` sink pointing at the network feature store, the server
writes tensors **directly into the store** (zero-copy past the producer
process — reference server_capture.py:113-497 semantics) and the response's
``meta_info.spec_capture`` carries only keys/shapes/dtypes; otherwise tensors
return inline (base64) for small runs and tests.

Endpoints:
    GET  /health    → {"status": "ok"} once the model is loaded
    POST /generate  → body {"input_ids": [...], "loss_mask": [...],
                            "sample_id": str,
                            "spec_capture": {"sink": "store"|"inline",
                                             "store": "host:port",
                                             "generation": int}}
"""

from __future__ import annotations

import base64
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Sequence, Tuple

import ml_dtypes
import numpy as np

logger = logging.getLogger("specforge_tpu.capture_server")


class RequestCoalescer:
    """Server-side micro-batching for concurrent single /generate requests:
    collect requests for a short window (or until ``max_batch``), run ONE
    bucketed forward. Without this, N threads each pay a full prefill under
    the device lock; with it they share one — the server-side version of
    the reference's patch-side capture batching win (D2H 5-8 → 3.8
    ms/sample, BASELINE.md) for clients that don't use /generate_batch.

    A dedicated worker drains the queue; each item carries an event the
    handler thread blocks on. ``window_ms`` bounds added latency for a lone
    request after the first arrives (the first dequeue blocks, costing
    idle servers nothing)."""

    def __init__(self, engine, window_ms: float = 4.0, max_batch: int = 16):
        self._engine = engine
        self._window = window_ms / 1000.0
        self._max = max_batch
        self._q: "queue.Queue" = queue.Queue()
        self.batches_run = 0       # telemetry: forwards actually executed
        self.requests_served = 0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def capture(self, input_ids: np.ndarray, loss_mask: np.ndarray):
        item = {
            "sample": (input_ids, loss_mask),
            "event": threading.Event(),
            "result": None,
            "error": None,
        }
        self._q.put(item)
        item["event"].wait()
        if item["error"] is not None:
            raise item["error"]
        return item["result"]

    def stop(self):
        self._q.put(None)
        self._thread.join(timeout=5)

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            batch = [item]
            deadline = time.monotonic() + self._window
            while len(batch) < self._max:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._flush(batch)
                    return
                batch.append(nxt)
            self._flush(batch)

    def _flush(self, batch):
        try:
            results = self._engine.capture_batch(
                [it["sample"] for it in batch]
            )
            for it, res in zip(batch, results):
                it["result"] = res
        except Exception as exc:  # noqa: BLE001 — propagate to each waiter
            for it in batch:
                it["error"] = exc
        self.batches_run += 1
        self.requests_served += len(batch)
        for it in batch:
            it["event"].set()


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


def resolve_batch_shape(
    n_samples: int, longest: int, max_length: int,
    seq_buckets: Sequence[int], batch_buckets: Sequence[int],
) -> tuple:
    """(bsz, seq) padded bucket shape covering the request on BOTH axes —
    the terminal bucket always covers the data (an undersized fallback
    would overflow the padded buffer)."""
    buckets = [b for b in seq_buckets if b < max_length]
    buckets.append(max_length)
    seq = _bucket(min(longest, max_length), buckets)
    cap = [b for b in batch_buckets if b < n_samples]
    terminal = 1
    while terminal < n_samples:
        terminal *= 2
    cap.append(terminal)
    return _bucket(n_samples, cap), seq


class CaptureEngine:
    """Wraps the jitted target capture forward.

    Batched prefill: :meth:`capture_batch` pads a request batch to bucketed
    (batch, seq) shapes so XLA compiles a bounded set of variants, then runs
    ONE forward — the reference TargetBatchPartition + patch-side batched
    capture (batch_partition.py:20, capture D2H batching in
    docs/benchmarks/domino-disaggregated-performance.md:76-79). A lock
    serializes device use across server threads (one chip, donated buffers)."""

    SEQ_BUCKETS = (128, 256, 512, 1024, 2048, 4096, 8192)
    BATCH_BUCKETS = (1, 2, 4, 8, 16)

    def __init__(self, target_model_path: str, capture_layers: Sequence[int],
                 layout: str = "eagle", max_length: int = 2048,
                 target_config=None, target_params=None, mesh=None,
                 moe_impl: Optional[str] = None,
                 moe_capacity_factor: Optional[float] = None):
        from specforge_tpu.offline_capture.capture import (
            OfflineCaptureConfig,
            OfflineCaptureRunner,
        )

        self.layout = layout
        self.max_length = max_length
        self._runner = OfflineCaptureRunner(
            OfflineCaptureConfig(
                target_model_path=target_model_path,
                output_dir="/tmp/unused",
                capture_layers=tuple(capture_layers),
                max_length=max_length,
                batch_size=1,
                layout=layout,
            ),
            target_config=target_config,
            target_params=target_params,
            mesh=mesh,
            moe_impl=moe_impl,
            moe_capacity_factor=moe_capacity_factor,
        )
        self.aux_name, self.last_name = {
            "eagle": ("hidden_state", "target"),
            "dflash": ("hidden_states", "target_last_hidden_states"),
        }[layout]
        self._device_lock = threading.Lock()

    def capture(self, input_ids: np.ndarray, loss_mask: np.ndarray):
        return self.capture_batch([(input_ids, loss_mask)])[0]

    def capture_batch(self, samples):
        """``samples``: list of (input_ids, loss_mask) → per-sample tensor
        dicts, one jitted forward at bucketed shapes."""
        lengths = [
            min(len(ids), self.max_length) for ids, _ in samples
        ]
        bsz, seq = resolve_batch_shape(
            len(samples), max(lengths), self.max_length,
            self.SEQ_BUCKETS, self.BATCH_BUCKETS,
        )
        ids = np.zeros((bsz, seq), np.int32)
        mask = np.zeros((bsz, seq), np.int32)
        for i, ((sample_ids, _), length) in enumerate(zip(samples, lengths)):
            ids[i, :length] = sample_ids[:length]
            mask[i, :length] = 1
        with self._device_lock:
            aux, last = self._runner._run_batch(ids, mask)
            aux = np.asarray(aux)
            last = np.asarray(last)
        out = []
        for i, ((sample_ids, sample_mask), length) in enumerate(
            zip(samples, lengths)
        ):
            out.append({
                "input_ids": np.asarray(sample_ids[:length], np.int64),
                "loss_mask": np.asarray(sample_mask[:length], np.int64),
                self.aux_name: aux[i, :length].astype(ml_dtypes.bfloat16),
                self.last_name: last[i, :length].astype(ml_dtypes.bfloat16),
            })
        return out


def _tensor_meta(tensors: Dict[str, np.ndarray]) -> Dict[str, Any]:
    from specforge_tpu.runtime.data_plane.feature_file import dtype_name

    return {
        name: {"shape": list(arr.shape), "dtype": dtype_name(arr.dtype)}
        for name, arr in tensors.items()
    }


class CaptureServer:
    def __init__(self, engine: CaptureEngine, host: str = "127.0.0.1",
                 port: int = 0, coalesce_window_ms: float = 4.0,
                 coalesce_max_batch: int = 16):
        self.engine = engine
        self.coalescer = RequestCoalescer(
            engine, window_ms=coalesce_window_ms,
            max_batch=coalesce_max_batch,
        )
        self._stores: Dict[str, Any] = {}
        self._lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def do_GET(self):
                if self.path == "/health":
                    self._reply(200, {
                        "status": "ok",
                        "layout": engine.layout,
                        "coalesce": {
                            "batches": server.coalescer.batches_run,
                            "requests": server.coalescer.requests_served,
                        },
                    })
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                handlers = {
                    "/generate": server.handle_generate,
                    "/generate_batch": server.handle_generate_batch,
                }
                handler = handlers.get(self.path)
                if handler is None:
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(length))
                    self._reply(200, handler(body))
                except Exception as exc:  # noqa: BLE001 — report to client
                    logger.exception("generate failed")
                    self._reply(500, {"error": str(exc)})

            def _reply(self, code, obj):
                payload = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def _store_for(self, endpoint: str, generation: int):
        from specforge_tpu.runtime.data_plane.network_store import (
            NetworkFeatureStore,
        )

        key = f"{endpoint}#g{generation}"
        with self._lock:
            if key not in self._stores:
                self._stores[key] = NetworkFeatureStore(
                    endpoint, generation=generation
                )
            return self._stores[key]

    def handle_generate_batch(self, body: Dict[str, Any]) -> Dict[str, Any]:
        """Batched prefill: {"samples": [{input_ids, loss_mask, sample_id}],
        "spec_capture": {...}} → {"results": [per-sample meta_info dicts]}.
        One jitted forward covers the whole batch (TargetBatchPartition
        producer side pairs with this endpoint)."""
        spec = body.get("spec_capture") or {}
        requests = body["samples"]
        samples = []
        for req in requests:
            ids = np.asarray(req["input_ids"], np.int64)
            raw_mask = req.get("loss_mask")  # key may be present-but-null
            mask = np.asarray(
                raw_mask if raw_mask is not None else np.ones_like(ids),
                np.int64,
            )
            samples.append((ids, mask))
        batch_tensors = self.engine.capture_batch(samples)
        results = [
            self._sink_one(
                str(req.get("sample_id", f"sample-{i}")), tensors, spec
            )
            for i, (req, tensors) in enumerate(zip(requests, batch_tensors))
        ]
        return {"results": results}

    def handle_generate(self, body: Dict[str, Any]) -> Dict[str, Any]:
        input_ids = np.asarray(body["input_ids"], np.int64)
        raw_mask = body.get("loss_mask")  # key may be present-but-null
        loss_mask = np.asarray(
            raw_mask if raw_mask is not None else np.ones_like(input_ids),
            np.int64,
        )
        sample_id = str(body.get("sample_id", "sample"))
        spec = body.get("spec_capture") or {}
        # concurrent single requests coalesce into one bucketed forward
        tensors = self.coalescer.capture(input_ids, loss_mask)
        return self._sink_one(sample_id, tensors, spec)

    def _sink_one(
        self, sample_id: str, tensors: Dict[str, np.ndarray],
        spec: Dict[str, Any],
    ) -> Dict[str, Any]:
        meta = _tensor_meta(tensors)
        sink = spec.get("sink", "inline")
        if sink == "store":
            store = self._store_for(
                spec["store"], int(spec.get("generation", 0))
            )
            ref = store.put_sample(sample_id, tensors)
            return {
                "meta_info": {
                    "spec_capture": {
                        "sample_id": sample_id,
                        "sink": "store",
                        "store": spec["store"],
                        "generation": int(spec.get("generation", 0)),
                        "features": meta,
                        "uris": {
                            name: handle.uri
                            for name, handle in ref.features.items()
                        },
                    }
                }
            }
        if sink == "inline":
            blobs = {
                name: base64.b64encode(
                    np.ascontiguousarray(arr).tobytes()
                ).decode()
                for name, arr in tensors.items()
            }
            return {
                "meta_info": {
                    "spec_capture": {
                        "sample_id": sample_id,
                        "sink": "inline",
                        "features": meta,
                        "data": blobs,
                    }
                }
            }
        raise ValueError(f"unknown spec_capture sink {sink!r}")

    def start(self):
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=5)
        self.coalescer.stop()
