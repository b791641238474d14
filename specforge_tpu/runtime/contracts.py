"""Metadata contracts shared by every layer of the runtime.

These are dependency-light dataclasses (stdlib only — no jax/numpy imports) so the
control plane can pass them across process and host boundaries as JSON. The
load-bearing invariant, carried over from the reference design
(/root/reference/specforge/runtime/contracts.py:45-194): control-plane records are
*metadata only, never tensors*. Tensors move exclusively through the feature-store
data plane and surface only inside :class:`TrainBatch` on the trainer side.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Mapping, Optional, Tuple

__all__ = [
    "PromptTask",
    "FeatureSpec",
    "FeatureHandle",
    "SampleRef",
    "TrainBatch",
    "assert_no_tensors",
    "ContractViolation",
]


class ContractViolation(TypeError):
    """Raised when a tensor-like object leaks into a metadata-only record."""


# dtypes the data plane knows how to (de)serialize. Names follow numpy/jax
# conventions; bfloat16 rides as raw uint16 payloads in stores that lack it.
SUPPORTED_DTYPES = (
    "float32",
    "bfloat16",
    "float16",
    "float64",
    "int8",
    "int16",
    "int32",
    "int64",
    "uint8",
    "uint16",
    "uint32",
    "bool",
)


@dataclass(frozen=True)
class FeatureSpec:
    """Shape/dtype contract of one named feature tensor of one sample."""

    name: str
    shape: Tuple[int, ...]
    dtype: str

    def __post_init__(self) -> None:
        if self.dtype not in SUPPORTED_DTYPES:
            raise ValueError(
                f"FeatureSpec dtype {self.dtype!r} not in {SUPPORTED_DTYPES}"
            )
        object.__setattr__(self, "shape", tuple(int(s) for s in self.shape))

    @property
    def nbytes(self) -> int:
        itemsize = {
            "float64": 8,
            "int64": 8,
            "float32": 4,
            "int32": 4,
            "uint32": 4,
            "bfloat16": 2,
            "float16": 2,
            "int16": 2,
            "uint16": 2,
            "int8": 1,
            "uint8": 1,
            "bool": 1,
        }[self.dtype]
        n = itemsize
        for s in self.shape:
            n *= s
        return n

    def to_json(self) -> Dict[str, Any]:
        return {"name": self.name, "shape": list(self.shape), "dtype": self.dtype}

    @classmethod
    def from_json(cls, obj: Mapping[str, Any]) -> "FeatureSpec":
        return cls(
            name=obj["name"], shape=tuple(obj["shape"]), dtype=str(obj["dtype"])
        )


@dataclass(frozen=True)
class FeatureHandle:
    """A pointer to one feature tensor inside a feature store.

    ``uri`` encodes backend + key + generation, e.g. ``local://sample-3/hidden.g0``
    or ``file:///data/shard0/sample-3.sft#hidden_state``. The generation suffix
    lets stores reject stale references after a producer restart.
    """

    uri: str
    spec: FeatureSpec

    def to_json(self) -> Dict[str, Any]:
        return {"uri": self.uri, "spec": self.spec.to_json()}

    @classmethod
    def from_json(cls, obj: Mapping[str, Any]) -> "FeatureHandle":
        return cls(uri=obj["uri"], spec=FeatureSpec.from_json(obj["spec"]))


@dataclass(frozen=True)
class SampleRef:
    """Metadata-only record of one training sample's feature tensors.

    Mirrors the reference ``SampleRef`` role (contracts.py:45-117): the unit that
    flows producer → channel → distributor → trainer inbox. Everything here must
    be JSON-serializable; :func:`assert_no_tensors` enforces it at controller
    boundaries.
    """

    sample_id: str
    features: Mapping[str, FeatureHandle]
    prompt_id: Optional[str] = None
    epoch: int = 0
    metadata: Mapping[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        assert_no_tensors(self.metadata, where=f"SampleRef({self.sample_id}).metadata")

    @property
    def nbytes(self) -> int:
        return sum(h.spec.nbytes for h in self.features.values())

    def to_json(self) -> Dict[str, Any]:
        return {
            "sample_id": self.sample_id,
            "prompt_id": self.prompt_id,
            "epoch": self.epoch,
            "features": {k: h.to_json() for k, h in self.features.items()},
            "metadata": dict(self.metadata),
        }

    @classmethod
    def from_json(cls, obj: Mapping[str, Any]) -> "SampleRef":
        return cls(
            sample_id=obj["sample_id"],
            prompt_id=obj.get("prompt_id"),
            epoch=int(obj.get("epoch", 0)),
            features={
                k: FeatureHandle.from_json(v) for k, v in obj["features"].items()
            },
            metadata=dict(obj.get("metadata", {})),
        )


@dataclass(frozen=True)
class PromptTask:
    """One prompt awaiting capture. ``payload`` must be JSON-safe."""

    prompt_id: str
    payload: Mapping[str, Any]
    epoch: int = 0
    attempt: int = 0

    def __post_init__(self) -> None:
        assert_no_tensors(self.payload, where=f"PromptTask({self.prompt_id}).payload")

    def to_json(self) -> Dict[str, Any]:
        return {
            "prompt_id": self.prompt_id,
            "payload": dict(self.payload),
            "epoch": self.epoch,
            "attempt": self.attempt,
        }

    @classmethod
    def from_json(cls, obj: Mapping[str, Any]) -> "PromptTask":
        return cls(
            prompt_id=obj["prompt_id"],
            payload=dict(obj["payload"]),
            epoch=int(obj.get("epoch", 0)),
            attempt=int(obj.get("attempt", 0)),
        )


@dataclass
class TrainBatch:
    """The only contract object allowed to carry tensors (device or host arrays).

    Produced by the feature dataloader's collate stage; consumed by a training
    strategy's ``forward_loss``.
    """

    tensors: Dict[str, Any]
    sample_ids: List[str] = field(default_factory=list)
    metadata: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        assert_no_tensors(self.metadata, where="TrainBatch.metadata")


def _is_tensor_like(obj: Any) -> bool:
    # Duck-typed so this module never imports jax/numpy/torch: every array
    # library exposes .shape and .dtype. Dataclasses (e.g. FeatureSpec, which
    # legitimately carries shape/dtype *metadata*) are recursed instead.
    if isinstance(obj, (str, bytes, type)):
        return False
    if dataclasses.is_dataclass(obj):
        return False
    return hasattr(obj, "shape") and hasattr(obj, "dtype")


def assert_no_tensors(obj: Any, where: str = "value") -> None:
    """Recursively reject array-like objects in metadata-only records.

    Reference semantics: runtime/contracts.py:156-194 — called at every control
    plane ingress so a tensor can never ride a metadata channel.
    """
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        for f in dataclasses.fields(obj):
            assert_no_tensors(getattr(obj, f.name), where=f"{where}.{f.name}")
        return
    if _is_tensor_like(obj):
        raise ContractViolation(
            f"{where}: tensor-like object {type(obj).__name__} in metadata-only "
            "record; tensors must travel through the feature store"
        )
    if isinstance(obj, Mapping):
        for k, v in obj.items():
            assert_no_tensors(k, where=f"{where}.key")
            assert_no_tensors(v, where=f"{where}[{k!r}]")
    elif isinstance(obj, (list, tuple, set, frozenset)):
        for i, v in enumerate(obj):
            assert_no_tensors(v, where=f"{where}[{i}]")
