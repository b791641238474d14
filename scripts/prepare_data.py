#!/usr/bin/env python
"""Convert public chat datasets to canonical conversation JSONL.

Canonical record: {"id": ..., "messages": [{"role", "content"}, ...]}.
Reference: specforge/scripts/prepare_data.py:18-614 — the named public
datasets get dedicated row processors; any of them can also be read from a
local .json/.jsonl dump (zero-egress environments), and the HF-hub loaders
activate when `datasets` is importable and the hub is reachable.

Usage:
    python scripts/prepare_data.py --dataset sharegpt --input ShareGPT.json --output out.jsonl
    python scripts/prepare_data.py --dataset gsm8k --output out.jsonl       # HF hub
    python scripts/prepare_data.py --dataset jsonl --input in.jsonl --output out.jsonl
"""

from __future__ import annotations

import argparse
import hashlib
import json
import random
import sys

sys.path.insert(0, ".")

ROLE_MAPPING = {
    "human": "user",
    "user": "user",
    "gpt": "assistant",
    "assistant": "assistant",
    "chatgpt": "assistant",
    "bing": "assistant",
    "bard": "assistant",
    "system": "system",
}


def _stable_id(*parts: str) -> str:
    h = hashlib.sha1()
    for part in parts:
        h.update(part.encode("utf-8", "ignore"))
        h.update(b"\x00")
    return h.hexdigest()[:16]


def _qa(row_id, user, assistant):
    return {
        "id": str(row_id),
        "messages": [
            {"role": "user", "content": user},
            {"role": "assistant", "content": assistant},
        ],
    }


# --- per-dataset row processors (field names are facts of the public sets,
# ref prepare_data.py:145-336) ----------------------------------------------

def process_ultrachat(row):
    messages = [
        {"role": m["role"], "content": m["content"]}
        for m in row["messages"]
        if m["role"] in ("user", "assistant")
    ]
    return {"id": str(row.get("prompt_id", _stable_id(json.dumps(messages)))),
            "messages": messages}


def process_sharegpt(row):
    messages = []
    for m in row["conversations"]:
        role = ROLE_MAPPING.get(m.get("from") or m.get("role"))
        if role is None:
            continue
        messages.append(
            {"role": role, "content": m.get("value") or m.get("content", "")}
        )
    return {"id": str(row.get("id", _stable_id(json.dumps(messages)))),
            "messages": messages}


def process_nebius_infinity(row):
    conv = row["conversation"][0]
    gen = row["generated_message"]
    return _qa(row["id"], conv["content"], gen["content"])


def process_opc(row):
    return _qa(
        _stable_id(row["instruction"], row["output"]),
        row["instruction"], row["output"],
    )


def process_codealpaca(row):
    user = (
        f"{row['instruction']}\n\n{row['input']}"
        if row.get("input") else row["instruction"]
    )
    return _qa(_stable_id(user, row["output"]), user, row["output"])


def process_opencodeinstruct(row):
    rid = row.get("id") or _stable_id(row["input"], row["output"])
    return _qa(rid, row["input"], row["output"])


def process_magicoder(row):
    return _qa(
        _stable_id(row["instruction"], row["response"]),
        row["instruction"], row["response"],
    )


def process_gsm8k(row):
    return _qa(
        _stable_id(row["question"], row["answer"]),
        row["question"], row["answer"],
    )


def process_hendrycks_math(row):
    return _qa(
        _stable_id(row["problem"], row["solution"]),
        row["problem"], row["solution"],
    )


def process_math_qa(row):
    user = f"{row['Problem']}\n{row['options']}"
    return _qa(_stable_id(user, row["Rationale"]), user, row["Rationale"])


def process_sciq(row):
    answers = [
        row["distractor3"], row["distractor1"], row["distractor2"],
        row["correct_answer"],
    ]
    # deterministic per-row shuffle: reproducible corpora (parity contract)
    rng = random.Random(_stable_id(row["question"]))
    rng.shuffle(answers)
    labels = ("a", "b", "c", "d")
    options = list(zip(labels, answers))
    correct = next(
        label for label, a in options if a == row["correct_answer"]
    )
    options_text = "\n".join(f"{label}) {a}" for label, a in options)
    user = f"{row['question']}\n{options_text}"
    assistant = (
        f"{row['support']}\nanswer: {correct}) {row['correct_answer']}"
    )
    return _qa(_stable_id(user, assistant), user, assistant)


def process_camel(row):
    return _qa(
        _stable_id(row["message_1"], row["message_2"]),
        row["message_1"], row["message_2"],
    )


def process_generic(row):
    from specforge_tpu.data.parse import normalize_conversation

    messages = normalize_conversation(row)
    return {"id": str(row.get("id", _stable_id(json.dumps(messages)))),
            "messages": messages}


# sharegpt-conversation-shaped hub sets reuse the sharegpt processor
PROCESSORS = {
    "ultrachat": process_ultrachat,
    "sharegpt": process_sharegpt,
    "eaglechat": process_sharegpt,
    "perfectblend": process_sharegpt,
    "perfectblend-llama3.1-8b-instruct": process_sharegpt,
    "perfectblend-llama3.3-70b-instruct": process_sharegpt,
    "perfectblend-llama4-scout-instruct": process_sharegpt,
    "perfectblend-llama4-maverick-instruct": process_sharegpt,
    "magpie-qwen2.5-pro-1m-v0.1": process_sharegpt,
    "nebius-llama31-8b-infinity-instruct": process_nebius_infinity,
    "opc": process_opc,
    "gsm8k": process_gsm8k,
    "hendrycks_math": process_hendrycks_math,
    "math_qa": process_math_qa,
    "codealpaca-20k": process_codealpaca,
    "opencodeinstruct": process_opencodeinstruct,
    "magicoder-evol-instruct": process_magicoder,
    "sciq": process_sciq,
    "camel": process_camel,
    "jsonl": process_generic,
    "json": process_generic,
}

# HF hub presets (hub id, config name or None, default split) — used when
# --input is absent; gsm8k/hendrycks_math/opc require an explicit config
HUB_PRESETS = {
    "ultrachat": ("HuggingFaceH4/ultrachat_200k", None, "train_sft"),
    "sharegpt": ("Aeala/ShareGPT_Vicuna_unfiltered", None, "train"),
    "opc": ("OpenCoder-LLM/opc-sft-stage1",
            "largescale_diverse_instruct", "train"),
    "gsm8k": ("openai/gsm8k", "main", "train"),
    "hendrycks_math": ("EleutherAI/hendrycks_math", "algebra", "train"),
    "math_qa": ("allenai/math_qa", None, "train"),
    "codealpaca-20k": ("sahil2801/CodeAlpaca-20k", None, "train"),
    "opencodeinstruct": ("nvidia/OpenCodeInstruct", None, "train"),
    "magicoder-evol-instruct": ("ise-uiuc/Magicoder-Evol-Instruct-110K",
                                None, "train"),
    "sciq": ("allenai/sciq", None, "train"),
    "camel": ("camel-ai/math", None, "train"),
}


def _iter_file(path):
    if path.endswith(".json"):
        with open(path) as f:
            yield from json.load(f)
        return
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def _iter_hub(dataset, split, subset=None):
    from datasets import load_dataset

    hub_id, default_subset, default_split = HUB_PRESETS[dataset]
    name = subset or default_subset
    if name and not subset:
        # don't let a pinned default read like the full dataset
        print(
            f"note: {dataset} defaults to config {name!r}; pass --subset "
            "to choose another (hendrycks_math has 7 subjects, opc has 3 "
            "stages)",
            file=sys.stderr,
        )
    args = (hub_id, name) if name else (hub_id,)
    yield from load_dataset(*args, split=split or default_split)


def convert(rows, processor, output):
    """rows → canonical JSONL; drops rows without an assistant turn."""
    n = skipped = 0
    with open(output, "w") as f:
        for row in rows:
            try:
                record = processor(row)
            except (KeyError, ValueError):
                skipped += 1
                continue
            if not any(
                m["role"] == "assistant" for m in record["messages"]
            ):
                skipped += 1
                continue
            f.write(json.dumps(record) + "\n")
            n += 1
    print(f"wrote {n} conversations to {output} ({skipped} skipped)")
    return n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", required=True,
                        choices=sorted(PROCESSORS))
    parser.add_argument("--input", help="local .json/.jsonl dump; omit to "
                                        "stream from the HF hub preset")
    parser.add_argument("--output", required=True)
    parser.add_argument("--split", default=None)
    parser.add_argument("--subset", default=None,
                        help="dataset config name (e.g. opc subsets)")
    args = parser.parse_args()

    if args.input:
        rows = _iter_file(args.input)
    elif args.dataset in HUB_PRESETS:
        rows = _iter_hub(args.dataset, args.split, args.subset)
    else:
        parser.error(f"--input required for dataset {args.dataset!r}")
    convert(rows, PROCESSORS[args.dataset], args.output)


if __name__ == "__main__":
    main()
