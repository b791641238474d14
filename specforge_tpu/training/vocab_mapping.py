"""Deterministic draft-vocab mapping (t2d/d2t) derivation + file IO.

The draft vocabulary is the ``draft_vocab_size`` most frequent target tokens
over the offline corpus (ties broken by lower token id), kept in ascending
token-id order so ``d2t[i] = target_id_i - i`` — reference semantics:
specforge/training/vocab_mapping.py:17 + data/preprocessing.py:587-664.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional, Tuple

import numpy as np


def derive_vocab_mapping(
    token_id_streams: Iterable[np.ndarray],
    vocab_size: int,
    draft_vocab_size: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Count token frequencies over the corpus → (t2d bool [V], d2t int32 [Vd])."""
    counts = np.zeros(vocab_size, np.int64)
    for ids in token_id_streams:
        ids = np.asarray(ids).reshape(-1)
        ids = ids[(ids >= 0) & (ids < vocab_size)]
        counts += np.bincount(ids, minlength=vocab_size)
    if draft_vocab_size > vocab_size:
        raise ValueError(
            f"draft_vocab_size {draft_vocab_size} > vocab_size {vocab_size}"
        )
    # stable top-k: np.argsort on (-count, id); lexsort keys are last-primary
    order = np.lexsort((np.arange(vocab_size), -counts))
    keep = np.sort(order[:draft_vocab_size])
    t2d = np.zeros(vocab_size, bool)
    t2d[keep] = True
    d2t = (keep - np.arange(draft_vocab_size)).astype(np.int32)
    return t2d, d2t


def save_vocab_mapping(path: str, t2d: np.ndarray, d2t: np.ndarray) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    np.savez(tmp, t2d=t2d, d2t=d2t)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_vocab_mapping(path: str) -> Tuple[np.ndarray, np.ndarray]:
    if path.endswith(".pt"):  # reference torch format
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        return (
            obj["t2d"].numpy().astype(bool),
            obj["d2t"].numpy().astype(np.int32),
        )
    data = np.load(path)
    return data["t2d"].astype(bool), data["d2t"].astype(np.int32)


def derive_from_offline_dir(
    data_dir: str, vocab_size: int, draft_vocab_size: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Derive the mapping from input_ids of every offline feature file."""
    from specforge_tpu.runtime.data_plane.feature_file import load_feature_file
    from specforge_tpu.runtime.data_plane.offline_reader import (
        OfflineManifestReader,
    )

    def streams():
        for path in OfflineManifestReader(data_dir).list_files():
            tensors, _ = load_feature_file(path)
            if "input_ids" in tensors:
                yield np.asarray(tensors["input_ids"])

    return derive_vocab_mapping(streams(), vocab_size, draft_vocab_size)
