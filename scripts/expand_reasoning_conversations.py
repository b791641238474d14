#!/usr/bin/env python
"""Expand regenerated reasoning conversations into per-generation-event rows.

Reference: scripts/expand_reasoning_conversations.py. A multi-turn
regenerated row (status=success, every assistant turn carrying
``reasoning_content``) becomes one training row PER assistant turn: the
event's conversation is the visible history up to that turn (assistant
history stripped of reasoning — the model never saw earlier reasoning)
plus the full assistant turn being supervised. Event ids are
``<source_id>#turn<N>``.

Refuses to overwrite outputs; invalid rows go to ``<out>_skipped.jsonl``
with the reason.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any, Dict, Iterable, List, Optional, Tuple

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from specforge_tpu.data.conversation_validation import (  # noqa: E402
    validate_conversation,
)


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--input-file-path", required=True)
    p.add_argument("--output-file-path", required=True)
    p.add_argument(
        "--skipped-file-path", default=None,
        help="defaults to <output>_skipped.jsonl",
    )
    return p.parse_args()


def validate_reasoning_row(row: Any) -> Optional[str]:
    if not isinstance(row, dict):
        return "expected a JSON object"
    if row.get("status") != "success":
        return "status must be 'success'"
    source_id = row.get("id")
    if not isinstance(source_id, str) or not source_id.strip():
        return "id must be a non-empty string"
    messages = row.get("conversations")
    reason = validate_conversation(messages, check_think=True)
    if reason is not None:
        return reason
    saw_assistant = False
    for i, m in enumerate(messages):
        if m.get("role") != "assistant":
            continue
        saw_assistant = True
        reasoning = m.get("reasoning_content")
        if not isinstance(reasoning, str) or not reasoning.strip():
            return (
                f"message {i}: assistant turn without non-empty "
                f"reasoning_content"
            )
    if not saw_assistant:
        return "conversation has no assistant turn"
    if messages[-1].get("role") != "assistant":
        return "conversation ends with a user turn"
    return None


def _visible(message: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(message)
    if out.get("role") == "assistant":
        out.pop("reasoning_content", None)
    return out


def expand_row(row: Dict[str, Any], source_row_index: int) -> List[Dict[str, Any]]:
    """One event per assistant turn: visible history + the supervised turn."""
    source_id = row["id"]
    history: List[Dict[str, Any]] = []
    events: List[Dict[str, Any]] = []
    turn = 0
    for message in row["conversations"]:
        if message["role"] != "assistant":
            history.append(dict(message))
            continue
        events.append({
            "id": f"{source_id}#turn{turn}",
            "source_id": source_id,
            "source_row_index": source_row_index,
            "assistant_turn_index": turn,
            "conversations": [dict(m) for m in history] + [dict(message)],
        })
        history.append(_visible(message))
        turn += 1
    return events


def iter_jsonl(path: str) -> Iterable[Tuple[int, Any]]:
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            if line.strip():
                yield i, json.loads(line)


def main() -> None:
    args = parse_args()
    out = args.output_file_path
    if not out.endswith(".jsonl"):
        raise SystemExit("output file path must end in .jsonl")
    skip = args.skipped_file_path or out[: -len(".jsonl")] + "_skipped.jsonl"
    paths = {os.path.abspath(p) for p in (args.input_file_path, out, skip)}
    if len(paths) != 3:
        raise SystemExit("input, output, and skipped paths must be distinct")
    for p in (out, skip):
        if os.path.exists(p):
            raise SystemExit(f"refusing to overwrite existing output: {p}")

    n_events = n_rows = n_skipped = 0
    with open(out, "w", encoding="utf-8") as f_out, \
            open(skip, "w", encoding="utf-8") as f_skip:
        for i, row in iter_jsonl(args.input_file_path):
            reason = validate_reasoning_row(row)
            if reason is not None:
                f_skip.write(json.dumps(
                    {"source_row_index": i, "error": reason, "data": row},
                    ensure_ascii=False,
                ) + "\n")
                n_skipped += 1
                continue
            for event in expand_row(row, i):
                f_out.write(json.dumps(event, ensure_ascii=False) + "\n")
                n_events += 1
            n_rows += 1
    print(
        f"expanded {n_rows} rows into {n_events} generation events "
        f"({n_skipped} skipped) → {out}"
    )


if __name__ == "__main__":
    main()
