"""HTTP inbox relay: multi-host consumers without a shared control filesystem.

Rank 0 (the RefDistributor host) serves its per-rank inbox JSONL files over
HTTP with byte-offset idempotent reads; remote ranks poll through
:class:`RemoteInboxChannel` (same interface as the filesystem ``InboxChannel``)
and report consumed counts back. Reference:
specforge/runtime/data_plane/http_inbox.py:78-324.

Endpoints:
    GET  /inbox/<rank>?offset=N   → {"lines": [...], "next_offset": M}
    POST /consumed                → {"rank": r, "count": n} (monotonic max)
    GET  /health                  → {"status": "ok", "ranks": K}
"""

from __future__ import annotations

import json
import os
import threading
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional, Tuple

from specforge_tpu.runtime.contracts import SampleRef


class InboxHTTPServer:
    def __init__(self, inbox_dir: str, host: str = "0.0.0.0", port: int = 0):
        self.inbox_dir = os.path.abspath(inbox_dir)
        self._consumed: Dict[int, int] = {}
        self._lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def _reply(self, code, obj):
                payload = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self):
                parsed = urllib.parse.urlparse(self.path)
                if parsed.path == "/health":
                    with server._lock:
                        ranks = len(server._consumed)
                    self._reply(200, {"status": "ok", "ranks": ranks})
                    return
                if parsed.path.startswith("/inbox/"):
                    try:
                        rank = int(parsed.path.split("/")[2])
                    except (IndexError, ValueError):
                        self._reply(400, {"error": "bad rank"})
                        return
                    query = urllib.parse.parse_qs(parsed.query)
                    offset = int(query.get("offset", ["0"])[0])
                    lines, next_offset = server.read_inbox(rank, offset)
                    self._reply(
                        200, {"lines": lines, "next_offset": next_offset}
                    )
                    return
                self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/consumed":
                    self._reply(404, {"error": "not found"})
                    return
                length = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(length))
                server.record_consumed(int(body["rank"]), int(body["count"]))
                self._reply(200, {"status": "ok"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def read_inbox(self, rank: int, offset: int) -> Tuple[List[str], int]:
        """Complete lines from byte ``offset``; partial tails are excluded so
        reads are idempotent under concurrent appends."""
        path = os.path.join(self.inbox_dir, f"rank{rank}.jsonl")
        if not os.path.exists(path):
            return [], offset
        lines: List[str] = []
        with open(path, "r") as f:
            f.seek(offset)
            while True:
                start = f.tell()
                line = f.readline()
                if not line or not line.endswith("\n"):
                    return lines, start
                lines.append(line.rstrip("\n"))

    def record_consumed(self, rank: int, count: int) -> None:
        with self._lock:
            self._consumed[rank] = max(self._consumed.get(rank, 0), count)

    def total_consumed(self) -> int:
        with self._lock:
            return sum(self._consumed.values())

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


class RemoteInboxChannel:
    """Drop-in for InboxChannel on hosts without the shared control dir."""

    def __init__(self, base_url: str, rank: int, timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.rank = rank
        self.timeout = timeout
        self._offset = 0
        self.consumed = 0

    def poll(self):
        url = (
            f"{self.base_url}/inbox/{self.rank}?offset={self._offset}"
        )
        with urllib.request.urlopen(url, timeout=self.timeout) as resp:
            body = json.loads(resp.read())
        self._offset = body["next_offset"]
        refs: List[SampleRef] = []
        closed = False
        failure: Optional[str] = None
        for line in body["lines"]:
            record = json.loads(line)
            kind = record.pop("kind", "ref")
            if kind == "ref":
                refs.append(SampleRef.from_json(record))
            elif kind == "closed":
                closed = True
            elif kind == "failed":
                failure = record.get("error", "producer failed")
        self.consumed += len(refs)
        return refs, closed, failure

    def report_consumed(self) -> None:
        data = json.dumps({"rank": self.rank, "count": self.consumed}).encode()
        req = urllib.request.Request(
            f"{self.base_url}/consumed", data=data,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout):
            pass
