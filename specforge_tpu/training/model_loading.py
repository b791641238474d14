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


#: torch dotted segment pairs → flax module names (reverse of the exporter's
#: _SEGMENT_FIXUPS, export/exporter.py)
_PAIR_MAP = {
    ("embed_proj", "0"): "embed_proj_0",
    ("embed_proj", "2"): "embed_proj_1",
}
_SEG_MAP = {"weight_ih_l0": "weight_ih", "weight_hh_l0": "weight_hh"}


def _flaxify_segments(parts):
    """torch dotted names → flax tree segments: ``layers.N`` (and
    ``fc_norm.N``) join to ``layers_N``; Sequential indices and GRU
    ``_l0`` suffixes map back to the flax param names."""
    out = []
    i = 0
    while i < len(parts):
        if i + 1 < len(parts):
            pair = (parts[i], parts[i + 1])
            if pair in _PAIR_MAP:
                out.append(_PAIR_MAP[pair])
                i += 2
                continue
            if parts[i] in ("layers", "fc_norm") and parts[i + 1].isdigit():
                out.append(f"{parts[i]}_{parts[i + 1]}")
                i += 2
                continue
        out.append(_SEG_MAP.get(parts[i], parts[i]))
        i += 1
    return out


def _load_from_safetensors(path, draft_params, draft_buffers):
    """Torch-convention export → flax params (kernel transpose etc.)."""
    import jax
    from safetensors.numpy import load_file

    tensors = load_file(path)
    flat = _flatten(draft_params)
    loaded = dict(flat)

    linear = {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
              "down_proj", "fc", "lm_head", "markov_w2", "embed_proj_0",
              "embed_proj_1", "gate_proj", "joint_proj", "proj"}
    normalized = {}
    for name, value in tensors.items():
        if name == "t2d":
            draft_buffers["t2d"] = np.asarray(value).astype(bool)
            continue
        if name == "d2t":
            draft_buffers["d2t"] = np.asarray(value).astype(np.int32)
            continue
        parts = _flaxify_segments(name.split("."))
        if parts[-1] != "weight":
            key = tuple(parts)
        else:
            parent = parts[:-1]
            if parent and parent[-1] in linear:
                key = tuple(parent + ["kernel"])
                value = np.asarray(value).T
            elif parent and (
                "embed" in parent[-1] or parent[-1] == "markov_w1"
            ):
                # nn.Embed tables (incl. dspark's markov_w1 prev-token
                # embedding): torch "weight" → flax "embedding", no transpose
                key = tuple(parent + ["embedding"])
            else:
                key = tuple(parent + ["weight"])
        normalized[key] = value
        if key in loaded:
            expected = loaded[key]
            value = np.asarray(value, np.float32)
            if value.shape != expected.shape:
                raise ValueError(
                    f"warm start shape mismatch at {'.'.join(key)}: "
                    f"{value.shape} vs {expected.shape}"
                )
            loaded[key] = value.astype(expected.dtype)

    # Column-merged projections (DFlash qkv_proj / gate_up_proj): fold
    # separate torch q/k/v (gate/up) tensors into the merged flax kernel.
    merged_parts = {
        "qkv_proj": ("q_proj", "k_proj", "v_proj"),
        "gate_up_proj": ("gate_proj", "up_proj"),
    }
    for key in list(loaded):
        if len(key) < 2 or key[-2] not in merged_parts:
            continue
        base, merged, leaf = key[:-2], key[-2], key[-1]
        axis = 1 if leaf == "kernel" else 0
        parts_v = [
            normalized.get(base + (n, leaf)) for n in merged_parts[merged]
        ]
        if any(p is None for p in parts_v):
            continue
        value = np.concatenate(
            [np.asarray(p, np.float32) for p in parts_v], axis=axis
        )
        expected = loaded[key]
        if value.shape != expected.shape:
            raise ValueError(
                f"warm start shape mismatch at {'.'.join(key)}: "
                f"{value.shape} vs {expected.shape}"
            )
        loaded[key] = value.astype(expected.dtype)
    return _unflatten(loaded), draft_buffers


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


def _flatten(tree, prefix=()):
    out = {}
    for key, value in tree.items():
        if isinstance(value, dict):
            out.update(_flatten(value, prefix + (key,)))
        else:
            out[prefix + (key,)] = value
    return out


def _unflatten(flat):
    out: Dict[str, Any] = {}
    for key, value in flat.items():
        node = out
        for seg in key[:-1]:
            node = node.setdefault(seg, {})
        node[key[-1]] = value
    return out
