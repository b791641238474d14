"""On-disk feature-file format for offline training.

Native format: one **safetensors** file per sample (`{sample_id}.sft`) holding
the capture tensors (bf16 rides natively via ml_dtypes) plus string metadata
(``target_repr``, capture layer ids, …). Chosen over the reference's
torch-pickled ``.ckpt`` because safetensors gives zero-copy mmap reads, cheap
header-only inspection (shapes/dtypes without touching tensor bytes — the lazy
manifest-reader contract of offline_reader.py), and is torch-free.

Compatibility: :func:`load_feature_file` also reads reference ``.ckpt``/
``.ckpt.gz`` files (torch CPU pickles, specforge data layout), and
:func:`convert_ckpt_to_safetensors` migrates them.
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Any, Dict, Mapping, Optional, Tuple

import ml_dtypes
import numpy as np

from specforge_tpu.runtime.contracts import FeatureSpec

_DTYPE_NAMES = {
    np.dtype(ml_dtypes.bfloat16): "bfloat16",
    np.dtype(np.float32): "float32",
    np.dtype(np.float16): "float16",
    np.dtype(np.float64): "float64",
    np.dtype(np.int64): "int64",
    np.dtype(np.int32): "int32",
    np.dtype(np.int16): "int16",
    np.dtype(np.int8): "int8",
    np.dtype(np.uint8): "uint8",
    np.dtype(np.uint16): "uint16",
    np.dtype(np.uint32): "uint32",
    np.dtype(np.bool_): "bool",
}


def dtype_name(dtype) -> str:
    return _DTYPE_NAMES.get(np.dtype(dtype), str(np.dtype(dtype)))


def save_feature_file(
    path: str,
    tensors: Mapping[str, np.ndarray],
    metadata: Optional[Mapping[str, str]] = None,
) -> None:
    from safetensors.numpy import save_file

    tmp = f"{path}.tmp.{os.getpid()}"
    save_file(
        {k: np.ascontiguousarray(v) for k, v in tensors.items()},
        tmp,
        metadata={str(k): str(v) for k, v in (metadata or {}).items()},
    )
    os.replace(tmp, path)  # atomic publish


def read_feature_specs(path: str) -> Tuple[Dict[str, FeatureSpec], Dict[str, str]]:
    """Header-only read: specs + metadata without loading tensor bytes."""
    from safetensors import safe_open

    specs: Dict[str, FeatureSpec] = {}
    with safe_open(path, framework="numpy") as f:
        meta = f.metadata() or {}
        for key in f.keys():
            sl = f.get_slice(key)
            dt = {
                "BF16": "bfloat16", "F32": "float32", "F16": "float16",
                "F64": "float64", "I64": "int64", "I32": "int32",
                "I16": "int16", "I8": "int8", "U8": "uint8",
                "U16": "uint16", "U32": "uint32", "BOOL": "bool",
            }[sl.get_dtype()]
            specs[key] = FeatureSpec(
                name=key, shape=tuple(sl.get_shape()), dtype=dt
            )
    return specs, dict(meta)


def _load_torch_ckpt(path: str) -> Dict[str, np.ndarray]:
    """Read a reference-format torch pickle (CPU), returning numpy arrays
    (bf16 → ml_dtypes.bfloat16, bit-exact via the uint16 view)."""
    import torch

    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            buf = io.BytesIO(f.read())
        obj = torch.load(buf, map_location="cpu", weights_only=False)
    else:
        obj = torch.load(path, map_location="cpu", weights_only=False)

    out: Dict[str, np.ndarray] = {}
    for key, value in obj.items():
        if isinstance(value, torch.Tensor):
            t = value.detach().contiguous()
            if t.dtype == torch.bfloat16:
                out[key] = (
                    t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
                )
            else:
                out[key] = t.numpy()
        else:
            out[key] = np.asarray(value)
    return out


def load_feature_file(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, str]]:
    """Load tensors + metadata from .sft (native) or .ckpt[.gz] (reference)."""
    if path.endswith((".ckpt", ".ckpt.gz")):
        tensors = _load_torch_ckpt(path)
        return tensors, {}
    from safetensors.numpy import load_file
    from safetensors import safe_open

    tensors = load_file(path)
    with safe_open(path, framework="numpy") as f:
        meta = f.metadata() or {}
    return tensors, dict(meta)


def convert_ckpt_to_safetensors(
    src: str, dst: str, metadata: Optional[Mapping[str, str]] = None
) -> None:
    tensors = _load_torch_ckpt(src)
    save_feature_file(dst, tensors, metadata)
