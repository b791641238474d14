#!/usr/bin/env python
"""Regenerate assistant turns of a conversation dataset from the target
model, so the draft trains against the target's own output distribution.

Reference behavior: scripts/regenerate_train_data.py (575 LoC, OpenAI
client against patched-SGLang `/v1/chat/completions`). This implementation
speaks the same OpenAI wire format over plain ``urllib`` (no client
dependency), so it drives SGLang, vLLM, or any OpenAI-compatible server
for the target model.

Per input row (ShareGPT JSONL, ``{"conversations": [...]}``): walk the
turns, keep system/user messages, and replace every assistant turn with a
fresh completion conditioned on the regenerated history so far. Rows fan
out over ``--server-address`` entries with ``--concurrency`` in-flight
requests per server. Outputs stream to three files in input order:
``<out>.jsonl`` (status=success), ``<out>_error.jsonl``,
``<out>_skipped.jsonl`` — and ``--resume`` skips
``len(success)+len(error)+len(skipped)`` input rows, so a rerun continues
exactly where the previous run stopped.

Reasoning modes (``--reasoning``):
- ``none``    — standard models, content saved as-is;
- ``save``    — thinking models: require and store ``reasoning_content``
                alongside the visible content; history sent back to the
                server strips reasoning (the reference's visible-history
                rule); rows with residual ``<think>`` markers are skipped;
- ``disable`` — request thinking off via chat_template_kwargs; responses
                that still carry think markers are skipped.

``--is-gpt-oss`` adds a per-request weighted-random ``reasoning_effort``
(low/medium/high at 4:4:2), matching the reference recipe.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import threading
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Tuple

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from specforge_tpu.data.conversation_validation import (  # noqa: E402
    has_think_marker,
    validate_conversation,
)


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", required=True)
    p.add_argument("--server-address", nargs="+", required=True,
                   help="host:port of OpenAI-compatible target servers")
    p.add_argument("--input-file-path", required=True)
    p.add_argument("--output-file-path", required=True)
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--concurrency", type=int, default=64,
                   help="in-flight requests PER SERVER")
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-p", type=float, default=None)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--repetition-penalty", type=float, default=None,
                   help="mapped to presence_penalty")
    p.add_argument("--max-tokens", type=int, default=4096)
    p.add_argument("--reasoning", choices=("none", "save", "disable"),
                   default="none")
    p.add_argument("--is-gpt-oss", action="store_true")
    p.add_argument("--timeout", type=float, default=600.0)
    return p.parse_args()


def _reasoning_effort() -> str:
    return random.choices(["low", "medium", "high"], weights=[4, 4, 2])[0]


def chat_completion(
    server: str, payload: Dict[str, Any], timeout: float
) -> Dict[str, Any]:
    req = urllib.request.Request(
        f"http://{server}/v1/chat/completions",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def build_payload(
    args, messages: List[Dict[str, Any]], max_tokens: Optional[int] = None
) -> Dict[str, Any]:
    query_messages = messages
    if args.reasoning == "save":
        # visible history: assistant turns go back without their reasoning
        query_messages = []
        for m in messages:
            m = dict(m)
            if m.get("role") == "assistant":
                m.pop("reasoning_content", None)
            query_messages.append(m)
    payload: Dict[str, Any] = {
        "model": args.model,
        "messages": query_messages,
        "max_tokens": max_tokens if max_tokens is not None else args.max_tokens,
        "temperature": args.temperature,
        "stream": False,
    }
    if args.top_p is not None:
        payload["top_p"] = args.top_p
    if args.repetition_penalty is not None:
        payload["presence_penalty"] = args.repetition_penalty
    if args.top_k is not None:
        payload["top_k"] = args.top_k
    if args.reasoning == "disable":
        payload["chat_template_kwargs"] = {"enable_thinking": False}
    elif args.reasoning == "save":
        payload["chat_template_kwargs"] = {"enable_thinking": True}
    if args.is_gpt_oss:
        payload["reasoning_effort"] = _reasoning_effort()
    return payload


def regenerate_row(
    args, server: str, row: Dict[str, Any], max_tokens: Optional[int] = None
) -> Dict[str, Any]:
    """Regenerate every assistant turn of one row in place; sets ``status``
    to success/error/skipped (+``error`` reason)."""
    messages = row.get("conversations")
    if messages and isinstance(messages, list) and isinstance(
        messages[0], dict
    ) and messages[0].get("role") == "assistant":
        row["status"] = "error"
        row["error"] = "conversation starts with an assistant message"
        return row

    regenerated: List[Dict[str, Any]] = []
    for message in messages:
        role = message.get("role")
        if role == "system":
            regenerated.append(message)
            continue
        if role == "assistant":
            continue  # replaced by a fresh completion after each user turn
        if role != "user":
            row["status"] = "error"
            row["error"] = f"invalid message role: {role!r}"
            return row
        regenerated.append(message)
        try:
            resp = chat_completion(
                server, build_payload(args, regenerated, max_tokens),
                args.timeout,
            )
            choice = resp["choices"][0]["message"]
        except Exception as exc:  # noqa: BLE001 — recorded per-row
            row["status"] = "error"
            row["error"] = str(exc)
            return row
        text = choice.get("content")
        # content checks are gated on max_tokens is None: the 1-token
        # server probe legitimately returns near-empty content
        if max_tokens is None and (
            not isinstance(text, str) or not text.strip()
        ):
            row["status"] = "error"
            row["error"] = "assistant response content is empty"
            return row
        if args.reasoning == "disable" and max_tokens is None and \
                has_think_marker(text):
            row["status"] = "skipped"
            row["error"] = (
                "non-reasoning response carries a think marker"
            )
            return row
        out_msg: Dict[str, Any] = {"role": "assistant", "content": text}
        if args.reasoning == "save":
            reasoning = choice.get("reasoning_content")
            if max_tokens is None:
                if (
                    not isinstance(text, str) or not text.strip()
                    or not isinstance(reasoning, str) or not reasoning.strip()
                ):
                    row["status"] = "error"
                    row["error"] = (
                        "reasoning mode requires non-empty content and "
                        "reasoning_content"
                    )
                    return row
                if has_think_marker(text) or has_think_marker(reasoning):
                    row["status"] = "skipped"
                    row["error"] = "response carries a residual think marker"
                    return row
            out_msg["reasoning_content"] = reasoning
        regenerated.append(out_msg)

    row["conversations"] = regenerated
    row["status"] = "success"
    return row


def _count_lines(path: str) -> int:
    if not os.path.exists(path):
        return 0
    with open(path, encoding="utf-8") as f:
        return sum(1 for _ in f)


def probe_servers(args) -> List[str]:
    """Keep only servers that answer a 1-token health completion."""
    ok = []
    for server in args.server_address:
        row = {"conversations": [{"role": "user", "content": "ping"}]}
        result = regenerate_row(args, server, dict(row), max_tokens=1)
        if result.get("status") == "success":
            ok.append(server)
        else:
            print(f"server {server} unavailable: {result.get('error')}",
                  file=sys.stderr)
    if not ok:
        raise SystemExit("no server address is available")
    return ok


def main() -> None:
    args = parse_args()
    if not 0.0 <= args.temperature <= 2.0:
        raise SystemExit("temperature must be in [0, 2]")
    out_path = args.output_file_path
    if not out_path.endswith(".jsonl"):
        raise SystemExit("output file path must end in .jsonl")
    err_path = out_path[: -len(".jsonl")] + "_error.jsonl"
    skip_path = out_path[: -len(".jsonl")] + "_skipped.jsonl"

    skip_rows = 0
    if args.resume:
        skip_rows = (
            _count_lines(out_path) + _count_lines(err_path)
            + _count_lines(skip_path)
        )
        print(f"resume: skipping first {skip_rows} input rows")

    # skip by non-blank ROW ordinal, not raw line index: each output line
    # corresponds to one non-blank input row, so resume math stays exact
    # even when the input contains blank lines
    rows: List[Tuple[int, Dict[str, Any]]] = []
    ordinal = 0
    with open(args.input_file_path, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            ordinal += 1
            if ordinal <= skip_rows:
                continue
            rows.append((ordinal - 1, json.loads(line)))
            if args.num_samples and len(rows) >= args.num_samples:
                break
    if not rows:
        print("nothing to do")
        return

    servers = probe_servers(args)
    print(f"regenerating {len(rows)} rows over {len(servers)} servers")

    mode = "a" if (args.resume and skip_rows > 0) else "w"
    lock = threading.Lock()
    sinks = {
        "success": open(out_path, mode, encoding="utf-8"),
        "error": open(err_path, mode, encoding="utf-8"),
        "skipped": open(skip_path, mode, encoding="utf-8"),
    }
    results: Dict[int, Dict[str, Any]] = {}
    next_write = 0
    counts = {"success": 0, "error": 0, "skipped": 0}

    def flush_in_order() -> None:
        nonlocal next_write
        while next_write < len(rows) and next_write in results:
            row = results.pop(next_write)
            status = row.get("status", "error")
            sinks[status].write(json.dumps(row, ensure_ascii=False) + "\n")
            sinks[status].flush()
            counts[status] += 1
            next_write += 1

    def work(idx: int) -> None:
        _line_no, row = rows[idx]
        reason = None
        if not isinstance(row, dict):
            row = {"status": "skipped", "error": "expected a JSON object",
                   "data": row}
        else:
            reason = validate_conversation(row.get("conversations"))
        if reason is not None:
            row["status"] = "skipped"
            row["error"] = reason
        elif row.get("status") != "skipped":
            server = servers[idx % len(servers)]
            row = regenerate_row(args, server, row)
        with lock:
            results[idx] = row
            flush_in_order()

    max_workers = max(1, args.concurrency * len(servers))
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        list(pool.map(work, range(len(rows))))

    for sink in sinks.values():
        sink.close()
    print(
        f"done: {counts['success']} success, {counts['error']} error, "
        f"{counts['skipped']} skipped → {out_path}"
    )


if __name__ == "__main__":
    main()
