"""Draft warm start + frozen-input provenance.

- :func:`warm_start_draft` loads draft weights (only) into freshly-initialized
  flax variables from either an exported safetensors directory (HF/SGLang
  layout) or a specforge-tpu checkpoint — the weights-only warm-start seam of
  the reference (training/model_loading.py:122-473), distinct from full
  resume.
- :func:`frozen_input_fingerprint` computes the stat-v2-style identity of
  frozen model inputs (weight-shard metadata + config JSON hashed, not
  full-file SHA — reference training/provenance.py:16-), recorded in the
  resume contract so a resumed run refuses silently-different targets.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Dict, Optional

import numpy as np


from specforge_tpu.models.model_loading import (  # noqa: F401
    _flatten,
    _flaxify_segments,
    _load_from_safetensors,
    _unflatten,
)


def frozen_input_fingerprint(model_path: Optional[str]) -> str:
    """Cheap, stable identity of a frozen checkpoint directory.

    Hashes the config JSON contents plus (name, size, mtime_ns) of every
    weight shard — detects swapped targets without reading terabytes.
    """
    if not model_path or not os.path.isdir(model_path):
        return ""
    digest = hashlib.sha256()
    config_path = os.path.join(model_path, "config.json")
    if os.path.exists(config_path):
        with open(config_path, "rb") as f:
            digest.update(f.read())
    for name in sorted(os.listdir(model_path)):
        if name.endswith((".safetensors", ".bin", ".index.json")):
            st = os.stat(os.path.join(model_path, name))
            digest.update(
                f"{name}:{st.st_size}:{st.st_mtime_ns}".encode()
            )
    return digest.hexdigest()[:16]


def draft_config_fingerprint(config_dict: Dict[str, Any]) -> str:
    return hashlib.sha256(
        json.dumps(config_dict, sort_keys=True).encode()
    ).hexdigest()[:16]


def warm_start_draft(
    variables: Dict[str, Any],
    checkpoint_path: str,
    *,
    draft_key: str = "draft_model",
) -> Dict[str, Any]:
    """Load draft weights into ``variables`` (weights only — no optimizer
    state, no schedule: this is warm start, not resume).

    ``checkpoint_path``: an exported draft dir (model.safetensors,
    torch-convention keys) or a specforge-tpu run/checkpoint dir.
    """
    params = variables["params"]
    nested = draft_key in params
    draft_params = params[draft_key] if nested else params
    buffers = dict(variables.get("buffers", {}))
    draft_buffers = (
        dict(buffers.get(draft_key, {})) if nested else dict(buffers)
    )

    sft = os.path.join(checkpoint_path, "model.safetensors")
    if os.path.exists(sft):
        new_draft, new_buffers = _load_from_safetensors(
            sft, draft_params, draft_buffers
        )
    else:
        new_draft, new_buffers = _load_from_checkpoint(
            checkpoint_path, draft_params, draft_buffers, draft_key
        )

    if nested:
        params = {**params, draft_key: new_draft}
        buffers = {**buffers, draft_key: new_buffers}
    else:
        params, buffers = new_draft, new_buffers
    return {**variables, "params": params, "buffers": buffers}


def _load_from_checkpoint(path, draft_params, draft_buffers, draft_key):
    from specforge_tpu.export.exporter import load_training_state

    state, _payload = load_training_state(path)
    saved_params = state["params"]
    saved_buffers = state.get("buffers") or {}
    if draft_key in saved_params:
        saved_params = saved_params[draft_key]
        saved_buffers = saved_buffers.get(draft_key, saved_buffers)

    flat_new = _flatten(draft_params)
    flat_saved = _flatten(saved_params)
    out = dict(flat_new)
    for key, value in flat_saved.items():
        if key in out:
            value = np.asarray(value)
            if value.shape != np.asarray(out[key]).shape:
                raise ValueError(
                    f"warm start shape mismatch at {'.'.join(key)}"
                )
            out[key] = value.astype(np.asarray(out[key]).dtype)
    for name in ("t2d", "d2t"):
        if name in saved_buffers:
            draft_buffers[name] = np.asarray(saved_buffers[name])
    return _unflatten(out), draft_buffers
