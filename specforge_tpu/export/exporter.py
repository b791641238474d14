"""Checkpoint export: training state → HF / SGLang serving directories.

The serving key layout is torch-convention (the format SGLang's EAGLE3 draft
loader and HF ``from_pretrained`` read): ``kernel`` leaves transpose to
``weight``, ``embedding`` leaves rename without transpose, flax's ``layers_N``
flattens to ``layers.N``. Required-serving-key validation mirrors
specforge/export/to_sglang.py:33-60 so a key the serving loader does not
expect can never be silently skipped.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterable, Mapping, Optional, Tuple

import ml_dtypes
import numpy as np

#: keys the sglang EAGLE3 spec-decoder loader requires in a draft checkpoint.
REQUIRED_SGLANG_KEYS = ("fc.weight", "norm.weight", "lm_head.weight", "t2d", "d2t")

#: backbone keys every DFlash-family serving draft must carry, plus the
#: per-projector auxiliary-head keys (reference
#: scripts/gates/normalize_dflash_export.py validates the config side; the
#: key check here catches a head the flax→torch flattener dropped).
REQUIRED_SGLANG_KEYS_DFLASH = (
    "fc.weight", "hidden_norm.weight", "norm.weight",
)
_DFLASH_HEAD_KEYS = {
    "domino": (
        "prefix_gru.weight_ih_l0", "prefix_gru.weight_hh_l0",
        "embed_proj.0.weight", "embed_proj.2.weight",
    ),
    "dspark": ("markov_head.markov_w1.weight", "markov_head.markov_w2.weight"),
}
#: dspark method-config fields SGLang's standalone loader reads top-level
#: (reference normalize_dflash_export.py:12-17).
_DSPARK_TOP_LEVEL_FIELDS = (
    "markov_rank", "markov_head_type", "enable_confidence_head",
    "confidence_head_with_markov",
)

#: per-architecture trainer-key → serving-key renames ({} = identity).
WEIGHT_MAPS: Dict[str, Dict[str, str]] = {
    "LlamaEagle3Draft": {},
    "LlamaForCausalLMEagle3": {},
}

# flax leaf-name fixups applied segment-wise
_SEGMENT_FIXUPS = {
    "weight_ih": "weight_ih_l0",
    "weight_hh": "weight_hh_l0",
    "embed_proj_0": "embed_proj.0",
    "embed_proj_1": "embed_proj.2",  # Sequential(Linear, SiLU, Linear)
}


def _fix_segment(seg: str) -> str:
    if seg in _SEGMENT_FIXUPS:
        return _SEGMENT_FIXUPS[seg]
    for prefix in ("layers_", "fc_norm_"):
        if seg.startswith(prefix) and seg[len(prefix):].isdigit():
            return f"{seg[:len(prefix) - 1]}.{seg[len(prefix):]}"
    return seg


def _to_numpy(x) -> np.ndarray:
    arr = np.asarray(x)
    return arr


def flax_to_serving_state(
    draft_params: Mapping[str, Any],
    buffers: Optional[Mapping[str, Any]] = None,
    dtype: str = "bfloat16",
) -> Dict[str, np.ndarray]:
    """Flatten a flax draft-param subtree into torch-convention tensors.

    Column-merged projections (DFlash's ``qkv_proj``/``gate_up_proj``,
    models/draft/dflash.py) split back to the separate torch-convention
    tensors serving loaders expect: ``gate_up_proj`` splits in equal halves;
    ``qkv_proj`` derives the q-column count from the sibling ``o_proj``
    kernel's input dim (= heads*head_dim) and splits the k/v remainder in
    half."""
    out: Dict[str, np.ndarray] = {}

    def cast(arr):
        if np.issubdtype(arr.dtype, np.floating):
            return arr.astype(
                ml_dtypes.bfloat16 if dtype == "bfloat16" else dtype
            )
        return arr

    def emit_split(sub, path, names, sizes):
        segs = [_fix_segment(s) for s in path]
        bounds = np.cumsum(sizes)[:-1]
        for leaf, value in sub.items():
            arr = _to_numpy(value)
            axis = 1 if leaf == "kernel" else 0
            pieces = np.split(arr, bounds, axis=axis)
            for name, piece in zip(names, pieces):
                if leaf == "kernel":
                    piece = piece.T
                    tleaf = "weight"
                else:
                    tleaf = leaf
                out[".".join(segs + [name, tleaf])] = np.ascontiguousarray(
                    cast(piece)
                )

    def walk(node, path):
        if isinstance(node, Mapping):
            for key, value in node.items():
                if key == "gate_up_proj":
                    half = _to_numpy(value["kernel"]).shape[1] // 2
                    emit_split(value, path, ("gate_proj", "up_proj"),
                               (half, half))
                    continue
                if key == "qkv_proj":
                    o_kernel = node.get("o_proj", {}).get("kernel")
                    if o_kernel is None:
                        raise ValueError(
                            "qkv_proj export requires a sibling o_proj to "
                            "derive the q/kv split at "
                            + ".".join(path + [key])
                        )
                    qd = _to_numpy(o_kernel).shape[0]
                    total = _to_numpy(value["kernel"]).shape[1]
                    kvd = (total - qd) // 2
                    emit_split(value, path, ("q_proj", "k_proj", "v_proj"),
                               (qd, kvd, kvd))
                    continue
                walk(value, path + [key])
            return
        arr = _to_numpy(node)
        leaf = path[-1]
        segs = [_fix_segment(s) for s in path[:-1]]
        if leaf == "kernel":
            name = ".".join(segs + ["weight"])
            arr = arr.T
        elif leaf == "embedding":
            name = ".".join(segs + ["weight"])
        elif leaf in ("weight", "bias", "scale", "mask_hidden"):
            name = ".".join(segs + [leaf]) if leaf != "mask_hidden" else (
                ".".join(segs + ["mask_hidden"]) if segs else "mask_hidden"
            )
        else:
            name = ".".join(segs + [_fix_segment(leaf)])
        if np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(
                ml_dtypes.bfloat16 if dtype == "bfloat16" else dtype
            )
        out[name] = np.ascontiguousarray(arr)

    walk(draft_params, [])
    for name, value in (buffers or {}).items():
        arr = _to_numpy(value)
        if name == "d2t":
            arr = arr.astype(np.int64)
        out[name] = np.ascontiguousarray(arr)
    return out


def _resolve_state_dir(checkpoint: str) -> str:
    """checkpoint = step dir | single-run root (→ latest via its marker);
    one resolver shared with training.resume_from."""
    from specforge_tpu.training.checkpoint import CheckpointManager

    return CheckpointManager.resolve_step_dir(checkpoint)


def load_training_state(checkpoint: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(raw orbax state dict, contract payload)."""
    import jax
    import orbax.checkpoint as ocp

    step_dir = _resolve_state_dir(checkpoint)
    # Restore to host numpy regardless of the topology the checkpoint was
    # saved under: exporting a pod-trained checkpoint from a single host is
    # the normal workflow (reference export/to_sglang.py loads state dicts on
    # CPU), and a sharding-faithful restore would demand the original device
    # set.
    ckptr = ocp.PyTreeCheckpointer()
    state_path = os.path.join(step_dir, "state")
    metadata = ckptr.metadata(state_path).item_metadata.tree
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), metadata
    )
    state = ckptr.restore(state_path, restore_args=restore_args)
    with open(os.path.join(step_dir, "contract.json")) as f:
        payload = json.load(f)
    return state, payload


def _extract_draft(state: Dict[str, Any]) -> Tuple[Dict, Dict]:
    params = state["params"]
    buffers = state.get("buffers") or {}
    draft_params = params.get("draft_model", params)
    draft_buffers = buffers.get("draft_model", buffers)
    return draft_params, draft_buffers


def _write_safetensors(path: str, tensors: Dict[str, np.ndarray]) -> None:
    from safetensors.numpy import save_file

    save_file(tensors, path)


def apply_legacy_rope_scaling(output_dir: str) -> bool:
    """Mirror modern/legacy RoPE scaling config fields on an export.

    Transformers v5 configs carry ``rope_parameters`` (with ``rope_theta``
    inside) while older serving stacks read only the legacy ``rope_scaling``
    dict plus a top-level ``rope_theta`` — and vice versa for configs written
    by older tooling being loaded by v5 stacks. Mirror whichever non-default
    representation exists into the other, and hoist ``rope_theta`` to the top
    level for legacy readers, so every exported draft loads identically under
    both generations of config parsers (reference contract:
    specforge/export/checkpoint_io.py:32-72, applied on every export by
    to_sglang.py:87 / to_hf.py). Disabled by
    ``SPECFORGE_DISABLE_LEGACY_ROPE_SCALING=1``. Returns True when the
    config.json was rewritten.
    """
    if os.environ.get(
        "SPECFORGE_DISABLE_LEGACY_ROPE_SCALING", ""
    ).strip().lower() in ("1", "true", "yes", "on"):
        return False
    config_path = os.path.join(output_dir, "config.json")
    if not os.path.exists(config_path):
        return False
    with open(config_path) as f:
        config = json.load(f)

    modern = config.get("rope_parameters")
    legacy = config.get("rope_scaling")

    def kind(payload) -> Optional[str]:
        if not payload:
            return None
        return payload.get("rope_type") or payload.get("type")

    changed = False
    # modern rope_theta wins over a stale top-level copy
    if modern and "rope_theta" in modern:
        if config.get("rope_theta") != modern["rope_theta"]:
            config["rope_theta"] = modern["rope_theta"]
            changed = True
    if modern and not legacy and kind(modern) not in (None, "default"):
        config["rope_scaling"] = {
            k: v for k, v in modern.items() if k != "rope_theta"
        }
        changed = True
    elif legacy and not modern and kind(legacy) not in (None, "default"):
        mirrored = dict(legacy)
        if "rope_theta" in config:
            mirrored.setdefault("rope_theta", config["rope_theta"])
        config["rope_parameters"] = mirrored
        changed = True
    if not changed:
        return False
    tmp = f"{config_path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(config, f, indent=2, sort_keys=True)
        f.write("\n")
    os.replace(tmp, config_path)
    return True


def _write_config(
    output_dir: str, draft_config_path: Optional[str],
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    config: Dict[str, Any] = {}
    if draft_config_path:
        with open(draft_config_path) as f:
            config = json.load(f)
    config.update(extra or {})
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    apply_legacy_rope_scaling(output_dir)


def export_to_sglang(
    checkpoint: str,
    output_dir: str,
    *,
    draft_config_path: Optional[str] = None,
    vocab_mapping_path: Optional[str] = None,
    weight_map: Optional[Dict[str, str]] = None,
    drop_embedding: bool = True,
) -> str:
    state, payload = load_training_state(checkpoint)
    strategy = payload.get("contract", {}).get("strategy")
    if strategy in ("dflash", "domino", "dspark"):
        return _export_dflash_to_sglang(
            state, strategy, output_dir,
            draft_config_path=draft_config_path, weight_map=weight_map,
        )
    if strategy not in (None, "eagle3"):
        raise ValueError(
            "the SGLang exporter supports EAGLE3 and DFlash-family "
            f"checkpoints, got strategy={strategy!r}; use --to hf for "
            "other families"
        )
    draft_params, draft_buffers = _extract_draft(state)
    if drop_embedding:
        draft_params = {
            k: v for k, v in draft_params.items() if "embed" not in k.lower()
        }
    if vocab_mapping_path:
        from specforge_tpu.training.vocab_mapping import load_vocab_mapping

        t2d, d2t = load_vocab_mapping(vocab_mapping_path)
        draft_buffers = {**draft_buffers, "t2d": t2d, "d2t": d2t}

    serving = flax_to_serving_state(draft_params, draft_buffers)
    if weight_map:
        serving = {weight_map.get(k, k): v for k, v in serving.items()}
    missing = [k for k in REQUIRED_SGLANG_KEYS if k not in serving]
    if missing:
        raise ValueError(
            f"serving state missing required keys {missing}; the sglang "
            f"loader would silently produce a broken draft. Present: "
            f"{sorted(serving)[:8]}..."
        )
    os.makedirs(output_dir, exist_ok=True)
    _write_safetensors(os.path.join(output_dir, "model.safetensors"), serving)
    _write_config(output_dir, draft_config_path)
    return output_dir


def _export_dflash_to_sglang(
    state: Dict[str, Any],
    strategy: str,
    output_dir: str,
    *,
    draft_config_path: Optional[str] = None,
    weight_map: Optional[Dict[str, str]] = None,
) -> str:
    """DFlash-family serving export with the config normalization SGLang's
    standalone loaders expect (reference
    scripts/gates/normalize_dflash_export.py:1-113): architectures become
    the serving class, dspark's method fields hoist top-level, block_size
    must be declared, auto_map is dropped. Drafts carry no embedding (they
    read the target's at serve time), so there is nothing to strip."""
    if not draft_config_path:
        raise ValueError(
            "DFlash-family SGLang export needs --draft-config (the serving "
            "config carries block_size + dflash_config)"
        )
    with open(draft_config_path) as f:
        config = json.load(f)
    block_size = config.get("block_size")
    if not isinstance(block_size, int) or block_size <= 1:
        raise ValueError(
            f"DFlash-family export requires integer block_size > 1 in the "
            f"draft config, got {block_size!r}"
        )
    method = dict(config.get("dflash_config") or {})
    projector = method.get("projector_type") or "dflash"
    expected = {"dflash": "dflash", "domino": "domino", "dspark": "dspark"}
    if expected.get(projector) != (
        "dflash" if strategy == "dflash" else strategy
    ):
        raise ValueError(
            f"strategy {strategy!r} does not match "
            f"dflash_config.projector_type={projector!r}"
        )

    draft_params, draft_buffers = _extract_draft(state)
    serving = flax_to_serving_state(draft_params, draft_buffers)
    if weight_map:
        serving = {weight_map.get(k, k): v for k, v in serving.items()}

    required = list(REQUIRED_SGLANG_KEYS_DFLASH)
    if strategy == "domino":
        required += _DFLASH_HEAD_KEYS["domino"]
    if strategy == "dspark" and method.get("markov_rank", 0) > 0:
        required += _DFLASH_HEAD_KEYS["dspark"]
    missing = [k for k in required if k not in serving]
    if missing:
        raise ValueError(
            f"serving state missing required keys {missing}; the serving "
            f"loader would silently produce a broken draft. Present: "
            f"{sorted(serving)[:8]}..."
        )

    # config normalization (reference normalize_dflash_export semantics)
    config.pop("auto_map", None)
    if strategy == "dspark":
        rank = method.get("markov_rank", config.get("markov_rank", 0))
        if not isinstance(rank, int) or isinstance(rank, bool) or rank <= 0:
            raise ValueError(
                f"DSpark export requires a positive integer markov_rank, "
                f"got {rank!r}"
            )
        head_type = str(
            method.get("markov_head_type", config.get("markov_head_type"))
            or ""
        ).lower()
        if head_type not in ("vanilla", "gated", "rnn"):
            raise ValueError(
                "DSpark export requires markov_head_type in "
                f"('vanilla', 'gated', 'rnn'), got {head_type!r}"
            )
        for key in _DSPARK_TOP_LEVEL_FIELDS:
            nested = method.get(key)
            if nested is None:
                continue
            top = config.get(key)
            if top is not None and top != nested:
                raise ValueError(
                    f"DSpark config conflict for {key}: top-level {top!r} "
                    f"!= dflash_config {nested!r}"
                )
            config[key] = nested
        config["markov_rank"] = rank
        config["markov_head_type"] = head_type
        config["architectures"] = ["Qwen3DSparkModel"]
    else:
        config["architectures"] = ["DFlashDraftModel"]

    os.makedirs(output_dir, exist_ok=True)
    _write_safetensors(os.path.join(output_dir, "model.safetensors"), serving)
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    apply_legacy_rope_scaling(output_dir)
    return output_dir


def export_to_hf(
    checkpoint: str,
    output_dir: str,
    *,
    draft_config_path: Optional[str] = None,
    vocab_mapping_path: Optional[str] = None,
    embedding_source: Optional[str] = None,
    embedding_key: str = "model.embed_tokens.weight",
) -> str:
    """Self-contained HF-layout directory (reloads with no missing keys).

    EAGLE3 checkpoints deliberately exclude the frozen embedding; pass
    ``embedding_source`` (the target model dir) so the export ships the real
    one — a random embedding would silently break serving
    (reference to_hf.py:77-108).
    """
    state, _payload = load_training_state(checkpoint)
    draft_params, draft_buffers = _extract_draft(state)

    has_embedding = any("embed" in k.lower() for k in draft_params)
    serving = {}
    if not has_embedding:
        if not embedding_source:
            raise ValueError(
                "checkpoint has no embed_tokens (draft checkpoints exclude "
                "the frozen embedding); pass embedding_source=<target model "
                "dir> so the export ships the real embedding"
            )
        from specforge_tpu.models.target.head import TargetHead

        embed = TargetHead.from_pretrained(
            embedding_source, lm_head_key=embedding_key
        )
        serving["embed_tokens.weight"] = np.ascontiguousarray(
            np.asarray(embed.weight)
        )
    if vocab_mapping_path:
        from specforge_tpu.training.vocab_mapping import load_vocab_mapping

        t2d, d2t = load_vocab_mapping(vocab_mapping_path)
        draft_buffers = {**draft_buffers, "t2d": t2d, "d2t": d2t}

    serving.update(flax_to_serving_state(draft_params, draft_buffers))
    os.makedirs(output_dir, exist_ok=True)
    _write_safetensors(os.path.join(output_dir, "model.safetensors"), serving)
    _write_config(output_dir, draft_config_path)
    return output_dir


def export_checkpoint(
    checkpoint: str,
    output_dir: str,
    fmt: str = "sglang",
    draft_config_path: Optional[str] = None,
    vocab_mapping_path: Optional[str] = None,
    **kwargs,
) -> str:
    if fmt == "sglang":
        return export_to_sglang(
            checkpoint, output_dir, draft_config_path=draft_config_path,
            vocab_mapping_path=vocab_mapping_path, **kwargs,
        )
    if fmt == "hf":
        return export_to_hf(
            checkpoint, output_dir, draft_config_path=draft_config_path,
            vocab_mapping_path=vocab_mapping_path, **kwargs,
        )
    raise ValueError(f"unknown export format {fmt!r}")
