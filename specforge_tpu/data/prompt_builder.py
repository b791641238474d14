"""Prompt-task preparation for online producers.

Raw / preformatted / pre-tokenized JSONL records → JSON-safe PromptTask
payloads with deterministic, epoch-tagged ordering (reference:
specforge/data/prompt_builder.py:20-336). The online producer replays exactly
this plan after restarts, so sampling is keyed on (prompt_seed, epoch).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Dict, Iterable, List, Optional

from specforge_tpu.runtime.contracts import PromptTask


def _stable_id(payload: Dict[str, Any], index: int) -> str:
    digest = hashlib.sha1(
        json.dumps(payload, sort_keys=True).encode()
    ).hexdigest()[:12]
    return f"prompt-{index:06d}-{digest}"


def load_prompt_records(path: str) -> List[Dict[str, Any]]:
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def prepare_prompt_tasks(
    records: Iterable[Dict[str, Any]],
    *,
    epoch: int = 0,
    prompt_seed: Optional[int] = None,
    shuffle: bool = True,
) -> List[PromptTask]:
    """Deterministic per-epoch plan: stable ids, keyed shuffle."""
    tasks = []
    for i, record in enumerate(records):
        payload = dict(record)
        tasks.append(
            PromptTask(
                prompt_id=_stable_id(payload, i), payload=payload, epoch=epoch
            )
        )
    if shuffle and prompt_seed is not None:
        import numpy as np

        order = np.random.default_rng(
            (prompt_seed, epoch)
        ).permutation(len(tasks))
        tasks = [tasks[i] for i in order]
    return tasks
