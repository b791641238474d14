"""Torch->flax draft weight mapping (the one reverse mapper for the whole
framework): kernel transposes, layers.N naming, folding split q/k/v
(gate/up) back into merged qkv_proj/gate_up_proj kernels. Leaf model-layer
utilities shared by training warm start (training/model_loading.py), export
reload (export/exporter.py), and the serving loaders
(inference/serving_loaders.py). Reference: training/model_loading.py:122-473.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

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
