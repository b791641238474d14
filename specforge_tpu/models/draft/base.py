"""Draft-model configuration base + registry.

Configs mirror the HF-style JSON the reference consumes
(/root/reference/configs/*.json), so the same config files drive both
frameworks. Model classes register by architecture name for
``AutoDraftModel``-style resolution.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Type

_DRAFT_REGISTRY: Dict[str, type] = {}


def register_draft(cls):
    """Class decorator: register by class name (the HF ``architectures`` entry)."""
    _DRAFT_REGISTRY[cls.__name__] = cls
    return cls


def resolve_draft_class(architecture: str):
    if architecture not in _DRAFT_REGISTRY:
        raise KeyError(
            f"Unknown draft architecture {architecture!r}; known: "
            f"{sorted(_DRAFT_REGISTRY)}"
        )
    return _DRAFT_REGISTRY[architecture]


@dataclass(frozen=True)
class DraftModelConfig:
    """Common HF-style fields; per-architecture configs extend this."""

    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_attention_heads: int
    num_key_value_heads: int
    num_hidden_layers: int = 1
    head_dim: Optional[int] = None
    hidden_act: str = "silu"
    rms_norm_eps: float = 1e-6
    max_position_embeddings: int = 32768
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    pad_token_id: Optional[int] = None
    bos_token_id: Optional[int] = None
    eos_token_id: Optional[int] = None
    tie_word_embeddings: bool = False
    architectures: Tuple[str, ...] = ()

    @property
    def resolved_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @classmethod
    def field_names(cls) -> set:
        return {f.name for f in dataclasses.fields(cls)}

    @classmethod
    def from_dict(cls, obj: Dict[str, Any]) -> "DraftModelConfig":
        known = cls.field_names()
        kwargs = {k: v for k, v in obj.items() if k in known}
        if "architectures" in kwargs and kwargs["architectures"] is not None:
            kwargs["architectures"] = tuple(kwargs["architectures"])
        return cls(**kwargs)

    @classmethod
    def from_file(cls, path) -> "DraftModelConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> Dict[str, Any]:
        out = dataclasses.asdict(self)
        out["architectures"] = list(out["architectures"])
        return out
