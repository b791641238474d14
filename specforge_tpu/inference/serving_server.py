"""HTTP serving endpoint over the fused speculative decoders.

The reference serves its exported drafts through SGLang (README.md:61;
exports are consumed by SGLang's spec-decode loader). This repo's exports
load there too, but the framework also serves NATIVELY: this module wraps
`Eagle3SpecDecoder` / `DFlashSpecDecoder` (inference/spec_decode.py — the
fused single-dispatch whole-generate programs) behind the same minimal
threaded-HTTP surface the capture server uses, so a trained + exported
draft is servable on TPU with nothing but this repo.

Endpoints:
  GET  /health           — status, decode family/config, perf counters
  POST /generate         — {"input_ids": [...], "max_new_tokens": N,
                            "topk"?, "tree_style"?, "stop_token_ids"?,
                            "plain"?: true}
                           → {"output_ids", "new_tokens", "accept_lengths",
                              "mean_accept_length", "rounds", "wall_ms"}
  POST /generate_batch   — {"prompts": [[ids], ...], "max_new_tokens": N,
                            "topk"?, "tree_style"?, "adaptive"?,
                            "stream_batch"?: W}
                           (eagle3: chain/tree/beam/adaptive + continuous
                           batching via stream_batch; dflash family: block
                           mode) → {"results": [...]}

Requests serialize on a device lock (one chip, one program at a time);
the fused loops make each generate a single dispatch, so the lock is held
for exactly one program execution per request.
"""

from __future__ import annotations

import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)


class SpecServingServer:
    """Thin HTTP front over one spec decoder (see module docstring)."""

    def __init__(self, decoder, host: str = "127.0.0.1", port: int = 0,
                 default_max_new_tokens: int = 128):
        self.decoder = decoder
        self.default_max_new_tokens = default_max_new_tokens
        self._device_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self.requests_served = 0
        self.tokens_emitted = 0
        self.decode_seconds = 0.0
        server = self

        family = type(decoder).__name__
        info: Dict[str, Any] = {"family": family,
                                "max_len": decoder.max_len}
        if hasattr(decoder, "k"):
            info["num_draft_tokens"] = decoder.k
        if hasattr(decoder, "block_size"):
            info["block_size"] = decoder.block_size

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def do_GET(self):
                if self.path == "/health":
                    with server._stats_lock:
                        secs = server.decode_seconds
                        counters = {
                            "requests": server.requests_served,
                            "output_tokens": server.tokens_emitted,
                            "decode_seconds": round(secs, 4),
                            "output_throughput": round(
                                server.tokens_emitted / secs, 2
                            ) if secs > 0 else 0.0,
                        }
                    self._reply(200, {"status": "ok", **info,
                                      "counters": counters})
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
                except (ValueError, KeyError, TypeError):
                    self._reply(400, {"error": "malformed JSON body"})
                    return
                try:
                    self._reply(200, handler(body))
                except (KeyError, ValueError, TypeError) as exc:
                    # client-input faults (missing input_ids, unsupported
                    # mode for this decoder family, bad types) are 4xx —
                    # and the message stays sanitized (no traceback text)
                    logger.warning("bad request on %s: %s", self.path, exc)
                    self._reply(400, {"error": f"bad request: {exc}"})
                except Exception:  # noqa: BLE001 — unexpected server fault
                    logger.exception("generate failed")
                    self._reply(500, {"error": "internal server error"})

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

    # -- request handlers ---------------------------------------------------

    def _record(self, new_tokens: int, wall: float):
        with self._stats_lock:
            self.requests_served += 1
            self.tokens_emitted += new_tokens
            self.decode_seconds += wall

    def handle_generate(self, body: Dict[str, Any]) -> Dict[str, Any]:
        ids = body["input_ids"]
        max_new = int(body.get("max_new_tokens",
                               self.default_max_new_tokens))
        stop = body.get("stop_token_ids")
        kwargs: Dict[str, Any] = {}
        topk = int(body.get("topk", 1))
        if topk > 1:
            kwargs["topk"] = topk
            if body.get("tree_style"):
                kwargs["tree_style"] = body["tree_style"]
        t0 = time.monotonic()
        with self._device_lock:
            if body.get("plain"):
                from specforge_tpu.inference.spec_decode import (
                    fused_plain_decode,
                )

                out = fused_plain_decode(
                    self.decoder.target_params, self.decoder.target_config,
                    list(ids), max_new_tokens=max_new,
                    max_len=self.decoder.max_len,
                    stop_token_ids=stop,
                )
                wall = time.monotonic() - t0
                new = len(out) - len(ids)
                self._record(new, wall)
                return {
                    "output_ids": [int(x) for x in out],
                    "new_tokens": new,
                    "wall_ms": round(wall * 1e3, 2),
                }
            result = self.decoder.generate_fused(
                list(ids), max_new_tokens=max_new, stop_token_ids=stop,
                **kwargs,
            )
        wall = time.monotonic() - t0
        new = len(result.output_ids) - len(ids)
        self._record(new, wall)
        return {
            "output_ids": [int(x) for x in result.output_ids],
            "new_tokens": new,
            "accept_lengths": [int(a) for a in result.accept_lengths],
            "mean_accept_length": round(result.mean_accept_length, 4),
            "rounds": result.steps,
            "wall_ms": round(wall * 1e3, 2),
        }

    def handle_generate_batch(self, body: Dict[str, Any]) -> Dict[str, Any]:
        prompts = body["prompts"]
        max_new = int(body.get("max_new_tokens",
                               self.default_max_new_tokens))
        stop = body.get("stop_token_ids")
        if not hasattr(self.decoder, "generate_batch_fused"):
            raise ValueError(
                "generate_batch is only available for the eagle3 decoder"
            )
        kwargs: Dict[str, Any] = {}
        topk = int(body.get("topk", 1))
        if topk > 1:
            kwargs["topk"] = topk
            if body.get("tree_style"):
                kwargs["tree_style"] = body["tree_style"]
        if body.get("adaptive"):
            kwargs["adaptive"] = True
        stream_batch = int(body.get("stream_batch", 0))
        t0 = time.monotonic()
        with self._device_lock:
            if stream_batch > 0:
                # continuous batching: fixed device batch width, rows
                # refill from the request's prompt queue as they finish
                results = self.decoder.generate_stream_fused(
                    [list(p) for p in prompts], max_new_tokens=max_new,
                    batch=stream_batch, stop_token_ids=stop,
                )
            else:
                results = self.decoder.generate_batch_fused(
                    [list(p) for p in prompts], max_new_tokens=max_new,
                    stop_token_ids=stop, **kwargs,
                )
        wall = time.monotonic() - t0
        new = sum(len(r.output_ids) - len(p)
                  for r, p in zip(results, prompts))
        self._record(new, wall)
        return {
            "results": [
                {
                    "output_ids": [int(x) for x in r.output_ids],
                    "accept_lengths": [int(a) for a in r.accept_lengths],
                    "mean_accept_length": round(r.mean_accept_length, 4),
                    "rounds": r.steps,
                }
                for r in results
            ],
            "new_tokens": new,
            "wall_ms": round(wall * 1e3, 2),
        }

    # -- lifecycle ----------------------------------------------------------

    def start(self):
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        logger.info("serving server listening on :%d", self.port)

    def stop(self):
        self.httpd.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self.httpd.server_close()
