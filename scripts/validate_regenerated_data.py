#!/usr/bin/env python
"""Validate a regenerated ShareGPT JSONL dataset before training.

Standalone gate over the regeneration pipeline's output (reference
scripts/validate_regenerated_data.py): every row must be a successful
generation with a well-formed conversation ending in an assistant turn;
reasoning expectations and inline-think-marker rejection are opt-in.
Exits non-zero on the first invalid row; prints one JSON summary line.

Usage:
    python scripts/validate_regenerated_data.py --data-path out.jsonl \
        [--expect-reasoning | --expect-non-reasoning] \
        [--strict-think-markers]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from specforge_tpu.data.conversation_validation import (  # noqa: E402
    has_think_marker,
    validate_conversation,
)


def validate_row(row, *, expect_non_reasoning, expect_reasoning,
                 strict_think_markers) -> int:
    """Raise ValueError on an invalid row; return its assistant count."""
    row_id = row.get("id")
    if not isinstance(row_id, str) or not row_id.strip():
        raise ValueError("id must be a non-empty string")
    if row.get("status") != "success":
        raise ValueError(f"status must be 'success', got {row.get('status')!r}")
    messages = row.get("conversations")
    reason = validate_conversation(messages)
    if reason is not None:
        raise ValueError(reason)
    if messages[-1].get("role") != "assistant":
        raise ValueError("conversation must end with an assistant message")

    assistants = 0
    for i, message in enumerate(messages):
        if message.get("role") != "assistant":
            continue
        assistants += 1
        reasoning = message.get("reasoning_content")
        if reasoning is not None and not isinstance(reasoning, str):
            raise ValueError(
                f"assistant message {i}: reasoning_content must be a "
                f"string or null"
            )
        if expect_non_reasoning and reasoning and reasoning.strip():
            raise ValueError(
                f"assistant message {i} carries reasoning_content but the "
                f"dataset is declared non-reasoning"
            )
        if expect_reasoning and not (
            isinstance(reasoning, str) and reasoning.strip()
        ):
            raise ValueError(
                f"assistant message {i} lacks reasoning_content but the "
                f"dataset is declared reasoning"
            )
        if strict_think_markers:
            if has_think_marker(message["content"]):
                raise ValueError(
                    f"assistant message {i} content carries a think marker"
                )
            if isinstance(reasoning, str) and has_think_marker(reasoning):
                raise ValueError(
                    f"assistant message {i} reasoning_content carries a "
                    f"think marker"
                )
    if assistants == 0:
        raise ValueError("conversation has no assistant message")
    return assistants


def validate_dataset(path, *, expect_non_reasoning=False,
                     expect_reasoning=False, strict_think_markers=False):
    rows = 0
    assistants = 0
    seen_ids = set()
    with open(path, encoding="utf-8") as f:
        for line_no, line in enumerate(f, start=1):
            if not line.strip():
                continue
            try:
                row = json.loads(line)
            except json.JSONDecodeError as exc:
                raise SystemExit(f"line {line_no}: invalid JSON: {exc}")
            if not isinstance(row, dict):
                raise SystemExit(f"line {line_no}: expected a JSON object")
            try:
                assistants += validate_row(
                    row,
                    expect_non_reasoning=expect_non_reasoning,
                    expect_reasoning=expect_reasoning,
                    strict_think_markers=strict_think_markers,
                )
            except ValueError as exc:
                raise SystemExit(
                    f"line {line_no} (id={row.get('id')!r}): {exc}"
                )
            if row["id"] in seen_ids:
                raise SystemExit(f"line {line_no}: duplicate id {row['id']!r}")
            seen_ids.add(row["id"])
            rows += 1
    if rows == 0:
        raise SystemExit(f"{path}: no rows")
    return {"rows": rows, "assistant_turns": assistants}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data-path", required=True)
    group = parser.add_mutually_exclusive_group()
    group.add_argument("--expect-non-reasoning", action="store_true")
    group.add_argument("--expect-reasoning", action="store_true")
    parser.add_argument("--strict-think-markers", action="store_true")
    args = parser.parse_args()
    summary = validate_dataset(
        args.data_path,
        expect_non_reasoning=args.expect_non_reasoning,
        expect_reasoning=args.expect_reasoning,
        strict_think_markers=args.strict_think_markers,
    )
    print(json.dumps({"status": "valid", "path": args.data_path, **summary}))


if __name__ == "__main__":
    main()
