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
