"""Batch collation with static shapes.

TPU contract: every batch the jitted train step sees has identical shapes, so
samples are padded (or truncated) to a fixed ``max_length``. The reference pads
dynamically per batch (data/utils.py:32); here the pad target is static by
design — recompilation is far costlier than padding waste on TPU.

Feature conventions (EAGLE3 offline layout — algorithms/eagle3/providers.py):
``input_ids`` [S], ``loss_mask`` [S] or [S,1], ``hidden_state`` [S, 3H] aux
concat, ``target`` [S, H] last hidden. ``attention_mask`` is derived from the
true length when absent.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Mapping, Optional, Sequence

import numpy as np

from specforge_tpu.runtime.contracts import TrainBatch


@dataclass(frozen=True)
class CollatorConfig:
    max_length: int
    pad_token_id: int = 0
    # cast floating features to this dtype on the host (None = keep stored)
    cast_float_dtype: Optional[str] = None


@dataclass(frozen=True)
class PackingCollatorConfig:
    """COD sequence packing (P-EAGLE): many short documents per row.

    Static contract: every batch is exactly ``rows`` rows of ``max_length``
    with a ``lengths`` [rows, max_docs_per_row] document-length vector
    (0-padded) — the COD sampler/mask derive per-position doc ids from it
    and forbid cross-document attention/anchoring
    (algorithms/peagle/model.py document_ids_from_lengths). Packing raises
    supervised tokens per optimizer step at batch 1, amortizing the
    HBM-bound fp32-master traffic that makes unpacked bs1 the MFU floor
    (reference trains P-EAGLE bs1-per-rank,
    specforge/algorithms/peagle/model.py).
    """

    max_length: int
    #: static number of packed rows per batch (the model's batch size)
    rows: int
    max_docs_per_row: int = 8
    pad_token_id: int = 0
    cast_float_dtype: Optional[str] = None


def _pad_to(arr: np.ndarray, length: int, pad_value=0) -> np.ndarray:
    s = arr.shape[0]
    if s == length:
        return arr
    if s > length:
        return arr[:length]
    pad_width = [(0, length - s)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad_width, constant_values=pad_value)


class PaddingCollator:
    """List of per-sample tensor dicts → TrainBatch of [B, max_length, ...]."""

    def __init__(self, config: CollatorConfig):
        self.config = config

    def __call__(
        self,
        samples: Sequence[Mapping[str, np.ndarray]],
        sample_ids: Optional[Sequence[str]] = None,
        metadata: Optional[Dict[str, Any]] = None,
    ) -> TrainBatch:
        L = self.config.max_length
        batch: Dict[str, List[np.ndarray]] = {}
        lengths = []
        for sample in samples:
            ids = np.asarray(sample["input_ids"]).reshape(-1)
            lengths.append(min(ids.shape[0], L))
            for name, value in sample.items():
                arr = np.asarray(value)
                if name == "input_ids":
                    arr = arr.reshape(-1).astype(np.int32)
                    arr = _pad_to(arr, L, self.config.pad_token_id)
                elif name == "loss_mask":
                    arr = arr.reshape(arr.shape[0], -1)[:, 0].astype(np.int32)
                    arr = _pad_to(arr, L, 0)
                elif name == "attention_mask":
                    arr = arr.reshape(-1).astype(np.int32)
                    arr = _pad_to(arr, L, 0)
                elif name == "position_ids":
                    # [S] rope or [3, S] mrope (vision): pad the SEQUENCE
                    # (last) axis; batch-first [B, 3, S] downstream, the
                    # model transposes to rope's [3, B, S]
                    # (ref padding_position_ids_3d, data/utils.py:84-105)
                    arr = np.asarray(arr)
                    if arr.ndim == 1:
                        arr = _pad_to(arr.astype(np.int32), L, 0)
                    elif arr.ndim == 2:
                        if arr.shape[0] != 3:
                            raise ValueError(
                                "3D position_ids must be [3, S], got "
                                f"{arr.shape}"
                            )
                        s = min(arr.shape[1], L)
                        out3 = np.zeros((3, L), np.int32)
                        out3[:, :s] = arr[:, :s]
                        arr = out3
                    else:
                        raise ValueError(
                            f"position_ids must be [S] or [3, S], got "
                            f"{arr.shape}"
                        )
                else:
                    if arr.ndim == 1:
                        arr = _pad_to(arr, L, 0)
                    else:
                        arr = _pad_to(arr.reshape(arr.shape[0], -1), L, 0)
                batch.setdefault(name, []).append(arr)
        if "attention_mask" not in batch:
            masks = []
            for n in lengths:
                m = np.zeros(L, np.int32)
                m[:n] = 1
                masks.append(m)
            batch["attention_mask"] = masks

        stacked = {}
        for name, arrs in batch.items():
            out = np.stack(arrs)
            if (
                self.config.cast_float_dtype
                and np.issubdtype(out.dtype, np.floating)
            ):
                out = out.astype(self.config.cast_float_dtype)
            stacked[name] = out
        # loss_mask is consumed as [B, S, 1]
        if "loss_mask" in stacked and stacked["loss_mask"].ndim == 2:
            stacked["loss_mask"] = stacked["loss_mask"][..., None]
        return TrainBatch(
            tensors=stacked,
            sample_ids=list(sample_ids or []),
            metadata=dict(metadata or {}),
        )


class PackingCollator:
    """Packs documents into ``rows`` static rows for COD training.

    Placement is longest-processing-time: documents sorted by length land on
    the least-loaded row that still has space (and a free doc slot). A
    document that fits nowhere is truncated into the largest remaining gap
    (counted in ``metadata["packing"]["truncated_tokens"]``); with
    ``max_length ≈ docs_per_row × typical doc length`` truncation is rare.

    The LAST position of every document is loss-masked: the offline teacher
    shift (models/target/head.py target_head_preprocess) supervises position
    p with token p+1, which at a document boundary belongs to the next
    document. The boundary key's shifted input embedding is reachable only
    by its own (masked) query — depth-0 attention is causal and later
    queries fail the same-document predicate — so no supervised position
    sees cross-document state.
    """

    def __init__(self, config: PackingCollatorConfig):
        self.config = config

    def _doc_length(self, sample: Mapping[str, np.ndarray]) -> int:
        if "attention_mask" in sample:
            return int(np.asarray(sample["attention_mask"]).reshape(-1).sum())
        return int(np.asarray(sample["input_ids"]).reshape(-1).shape[0])

    def __call__(
        self,
        samples: Sequence[Mapping[str, np.ndarray]],
        sample_ids: Optional[Sequence[str]] = None,
        metadata: Optional[Dict[str, Any]] = None,
    ) -> TrainBatch:
        cfg = self.config
        L = cfg.max_length
        doc_lens = [min(self._doc_length(s), L) for s in samples]
        order = sorted(
            range(len(samples)), key=lambda i: doc_lens[i], reverse=True
        )
        row_load = [0] * cfg.rows
        row_docs: List[List[int]] = [[] for _ in range(cfg.rows)]
        take_len = dict(zip(range(len(samples)), doc_lens))
        truncated = 0
        dropped = 0
        for i in order:
            n = doc_lens[i]
            open_rows = [
                r for r in range(cfg.rows)
                if len(row_docs[r]) < cfg.max_docs_per_row
            ]
            fits = [r for r in open_rows if row_load[r] + n <= L]
            if fits:
                r = min(fits, key=lambda r: row_load[r])
            elif open_rows:
                r = min(open_rows, key=lambda r: row_load[r])
                gap = L - row_load[r]
                if gap <= 1:
                    dropped += 1
                    continue
                truncated += n - gap
                take_len[i] = gap
            else:
                dropped += 1
                continue
            row_docs[r].append(i)
            row_load[r] += take_len[i]

        skip = {"attention_mask", "position_ids"}
        names = [n for n in samples[0].keys() if n not in skip] if samples \
            else []
        tensors: Dict[str, np.ndarray] = {}
        lengths = np.zeros((cfg.rows, cfg.max_docs_per_row), np.int32)
        attention_mask = np.zeros((cfg.rows, L), np.int32)
        for r in range(cfg.rows):
            # keep documents in arrival order inside the row so packing is
            # deterministic under the loader's ordered prefetch
            row_docs[r].sort()
            for slot, i in enumerate(row_docs[r]):
                lengths[r, slot] = take_len[i]
            attention_mask[r, : row_load[r]] = 1
        for name in names:
            parts: List[np.ndarray] = []
            for r in range(cfg.rows):
                row_parts: List[np.ndarray] = []
                for i in row_docs[r]:
                    arr = np.asarray(samples[i][name])
                    if name == "input_ids":
                        arr = arr.reshape(-1).astype(np.int32)
                    elif name == "loss_mask":
                        arr = arr.reshape(arr.shape[0], -1)[:, 0].astype(
                            np.int32
                        ).copy()
                    elif arr.ndim > 1:
                        arr = arr.reshape(arr.shape[0], -1)
                    arr = arr[: take_len[i]]
                    if name == "loss_mask" and arr.shape[0] > 0:
                        arr[-1] = 0  # boundary: label is the next document
                    row_parts.append(arr)
                if row_parts:
                    row = np.concatenate(row_parts, axis=0)
                else:
                    proto = np.asarray(samples[0][name]) if samples else \
                        np.zeros((0,), np.int32)
                    shape = (0,) if proto.ndim == 1 else (0, int(
                        np.prod(proto.shape[1:])
                    ))
                    row = np.zeros(shape, proto.dtype)
                pad = cfg.pad_token_id if name == "input_ids" else 0
                parts.append(_pad_to(row, L, pad))
            out = np.stack(parts)
            if cfg.cast_float_dtype and np.issubdtype(
                out.dtype, np.floating
            ):
                out = out.astype(cfg.cast_float_dtype)
            tensors[name] = out
        tensors["attention_mask"] = attention_mask
        tensors["lengths"] = lengths
        if "loss_mask" in tensors and tensors["loss_mask"].ndim == 2:
            tensors["loss_mask"] = tensors["loss_mask"][..., None]
        meta = dict(metadata or {})
        meta["packing"] = {
            "docs": len(samples) - dropped,
            "dropped_docs": dropped,
            "truncated_tokens": truncated,
        }
        return TrainBatch(
            tensors=tensors,
            sample_ids=list(sample_ids or []),
            metadata=meta,
        )
