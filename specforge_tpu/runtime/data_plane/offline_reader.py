"""Offline manifest reading + deterministic per-rank sharding.

One lazy ``file://`` SampleRef per capture file, no eager tensor/header reads
(the reference documents the startup-cost rationale — offline_reader.py in the
reference runtime). Ordering is deterministic (sorted paths) so every rank
derives the same global manifest, then takes a strided shard.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

from specforge_tpu.runtime.contracts import SampleRef
from specforge_tpu.runtime.data_plane.feature_store import FileFeatureStore

FEATURE_SUFFIXES = (".sft", ".ckpt", ".ckpt.gz")


class OfflineManifestReader:
    def __init__(self, root: str, *, suffixes: Sequence[str] = FEATURE_SUFFIXES):
        self.root = os.path.abspath(root)
        self.suffixes = tuple(suffixes)

    def list_files(self) -> List[str]:
        out: List[str] = []
        for dirpath, _dirnames, filenames in os.walk(self.root):
            for name in filenames:
                if name.endswith(self.suffixes):
                    out.append(os.path.join(dirpath, name))
        out.sort()
        return out

    def read(self, epoch: int = 0) -> List[SampleRef]:
        return [
            FileFeatureStore.ref_for_file(path, epoch=epoch)
            for path in self.list_files()
        ]


def shard_refs(
    refs: Sequence[SampleRef],
    rank: int,
    world_size: int,
    *,
    drop_remainder: bool = True,
) -> List[SampleRef]:
    """Deterministic strided shard; with ``drop_remainder`` every rank gets the
    same count (floor(n / world)) so collectives stay in lockstep — reference
    `_shard_offline_refs` (launch.py:174)."""
    if world_size <= 1:
        return list(refs)
    if drop_remainder:
        usable = (len(refs) // world_size) * world_size
        refs = refs[:usable]
    return list(refs[rank::world_size])
