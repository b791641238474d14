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
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Sequence, Tuple

import ml_dtypes
import numpy as np

logger = logging.getLogger("specforge_tpu.capture_server")


class CaptureEngine:
    """Wraps the jitted target capture forward for request batching (bs 1 per
    request here; the batching rollout rides multiple workers)."""

    def __init__(self, target_model_path: str, capture_layers: Sequence[int],
                 layout: str = "eagle", max_length: int = 2048,
                 target_config=None, target_params=None):
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
        )
        self.aux_name, self.last_name = {
            "eagle": ("hidden_state", "target"),
            "dflash": ("hidden_states", "target_last_hidden_states"),
        }[layout]

    def capture(self, input_ids: np.ndarray, loss_mask: np.ndarray):
        length = min(len(input_ids), self.max_length)
        ids = np.zeros((1, self.max_length), np.int32)
        mask = np.zeros((1, self.max_length), np.int32)
        ids[0, :length] = input_ids[:length]
        mask[0, :length] = 1
        aux, last = self._runner._run_batch(ids, mask)
        return {
            "input_ids": np.asarray(input_ids[:length], np.int64),
            "loss_mask": np.asarray(loss_mask[:length], np.int64),
            self.aux_name: aux[0, :length].astype(ml_dtypes.bfloat16),
            self.last_name: last[0, :length].astype(ml_dtypes.bfloat16),
        }


def _tensor_meta(tensors: Dict[str, np.ndarray]) -> Dict[str, Any]:
    from specforge_tpu.runtime.data_plane.feature_file import dtype_name

    return {
        name: {"shape": list(arr.shape), "dtype": dtype_name(arr.dtype)}
        for name, arr in tensors.items()
    }


class CaptureServer:
    def __init__(self, engine: CaptureEngine, host: str = "127.0.0.1",
                 port: int = 0):
        self.engine = engine
        self._stores: Dict[str, Any] = {}
        self._lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def do_GET(self):
                if self.path == "/health":
                    self._reply(200, {"status": "ok",
                                      "layout": engine.layout})
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/generate":
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(length))
                    self._reply(200, server.handle_generate(body))
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

    def handle_generate(self, body: Dict[str, Any]) -> Dict[str, Any]:
        input_ids = np.asarray(body["input_ids"], np.int64)
        loss_mask = np.asarray(
            body.get("loss_mask", np.ones_like(input_ids)), np.int64
        )
        sample_id = str(body.get("sample_id", "sample"))
        spec = body.get("spec_capture") or {}
        tensors = self.engine.capture(input_ids, loss_mask)
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
