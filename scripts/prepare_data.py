#!/usr/bin/env python
"""Convert public chat datasets to canonical conversation JSONL.

Canonical record: {"messages": [{"role": ..., "content": ...}, ...]}.
Reference: specforge/scripts/prepare_data.py:60-614 (14 public datasets; here
the common ones plus a generic JSONL normalizer — HF-hub loaders activate only
when `datasets` is importable and the dataset is reachable).

Usage:
    python scripts/prepare_data.py --dataset jsonl --input in.jsonl --output out.jsonl
    python scripts/prepare_data.py --dataset sharegpt --input ShareGPT.json --output out.jsonl
    python scripts/prepare_data.py --dataset ultrachat --output out.jsonl  # HF hub
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

from specforge_tpu.data.parse import normalize_conversation  # noqa: E402


def _write(records, output):
    n = 0
    with open(output, "w") as f:
        for record in records:
            try:
                messages = normalize_conversation(record)
            except ValueError:
                continue
            if not any(m["role"] == "assistant" for m in messages):
                continue
            f.write(json.dumps({"messages": messages}) + "\n")
            n += 1
    print(f"wrote {n} conversations to {output}")


def _iter_jsonl(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def _iter_json(path):
    with open(path) as f:
        data = json.load(f)
    yield from data


def _iter_ultrachat(split):
    from datasets import load_dataset

    ds = load_dataset("HuggingFaceH4/ultrachat_200k", split=split)
    for row in ds:
        yield {"messages": row["messages"]}


def _iter_sharegpt_hub(split):
    from datasets import load_dataset

    ds = load_dataset("Aeala/ShareGPT_Vicuna_unfiltered", split=split)
    for row in ds:
        yield {"conversations": row["conversations"]}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--dataset", required=True,
        choices=["jsonl", "json", "sharegpt", "ultrachat"],
    )
    parser.add_argument("--input")
    parser.add_argument("--output", required=True)
    parser.add_argument("--split", default="train_sft")
    args = parser.parse_args()

    if args.dataset in ("jsonl", "sharegpt") and args.input:
        it = (
            _iter_jsonl(args.input)
            if args.input.endswith(".jsonl")
            else _iter_json(args.input)
        )
    elif args.dataset == "json":
        it = _iter_json(args.input)
    elif args.dataset == "ultrachat":
        it = _iter_ultrachat(args.split)
    elif args.dataset == "sharegpt":
        it = _iter_sharegpt_hub(args.split)
    else:
        raise SystemExit(f"unknown dataset {args.dataset}")
    _write(it, args.output)


if __name__ == "__main__":
    main()
