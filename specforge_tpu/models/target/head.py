"""Frozen target lm_head: projects stored last-hidden-states to teacher logits.

Offline capture stores the target model's final hidden state; the trainer
re-runs the (frozen, bf16) ``lm_head`` and owns the teacher shift. Mirrors
specforge/modeling/target/target_head.py:15-108 — including the safetensors
index walk for loading the weight from a target checkpoint directory.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from specforge_tpu.utils import shift_pad


class TargetHead:
    """Holds the [V, H] lm_head weight as a jax array (bf16 by default)."""

    def __init__(self, weight: jnp.ndarray, vocab_size: Optional[int] = None):
        self.weight = weight
        self.vocab_size = vocab_size or weight.shape[0]
        self.hidden_size = weight.shape[1]

    @classmethod
    def from_pretrained(
        cls,
        model_path: str,
        lm_head_key: str = "lm_head.weight",
        dtype=jnp.bfloat16,
    ) -> "TargetHead":
        """Load from a local HF checkpoint dir via its *.index.json weight map.

        Falls back to a single ``model.safetensors`` when no index exists.
        Tied-embedding targets omit ``lm_head.weight`` from the shards; the
        loader falls back to ``model.embed_tokens.weight`` when the config
        declares ``tie_word_embeddings`` (reference target_utils.py weight
        tying handling).
        """
        raw: dict = {}
        config_path = os.path.join(model_path, "config.json")
        if os.path.exists(config_path):
            with open(config_path) as f:
                raw = json.load(f)

        index_files = glob.glob(os.path.join(model_path, "*.index.json"))
        if len(index_files) > 1:
            raise FileNotFoundError(
                f"Multiple index.json files found in {model_path}"
            )
        tied_fallback = (
            lm_head_key == "lm_head.weight"
            and raw.get("tie_word_embeddings", False)
        )
        if index_files:
            with open(index_files[0]) as f:
                index = json.load(f)
            weight_map = index["weight_map"]
            if lm_head_key not in weight_map and tied_fallback:
                lm_head_key = "model.embed_tokens.weight"
            shard = weight_map[lm_head_key]
            shard_path = os.path.join(model_path, shard)
        else:
            shard_path = os.path.join(model_path, "model.safetensors")
            if not os.path.exists(shard_path):
                raise FileNotFoundError(
                    f"No index.json or model.safetensors in {model_path}"
                )
        from safetensors import safe_open

        with safe_open(shard_path, framework="flax") as f:
            if lm_head_key not in f.keys() and tied_fallback:
                lm_head_key = "model.embed_tokens.weight"
            weight = f.get_tensor(lm_head_key)
        weight = jnp.asarray(weight, dtype)
        # muP targets: fold the width multiplier into the frozen head once
        # so teacher logits recomputed from the canonical captured hidden
        # match the target's serving logits (reference
        # target_utils.py:140-153; the serving capture stores the
        # pre-head-scale hidden — spec-capture.patch LogitsProcessor hunk).
        # Only the real lm_head is folded — embedding loads through this
        # same loader (export_to_hf embedding_source) must stay unscaled.
        if lm_head_key == "lm_head.weight" or tied_fallback:
            mup = raw.get("logits_mup_width_multiplier") or (
                raw.get("text_config") or {}
            ).get("logits_mup_width_multiplier")
            if mup:
                if raw.get("tie_word_embeddings", False):
                    raise ValueError(
                        "cannot fold logits_mup_width_multiplier into "
                        "a tied embedding/lm_head"
                    )
                weight = weight / float(mup)
        return cls(weight)

    def __call__(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """[B, S, H] → [B, S, V] logits in the weight's dtype."""
        return jnp.einsum(
            "bsh,vh->bsv",
            hidden.astype(self.weight.dtype),
            self.weight,
        )


def target_head_preprocess(
    input_ids: jnp.ndarray, target: jnp.ndarray, loss_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The teacher shift for offline hidden-state captures.

    Shifts ``target`` (hidden or logits) and ``input_ids`` one step left
    (position s now holds the teacher signal for predicting token s+1) and
    expands ``loss_mask`` to [B, S, 1]. Pure function (usable inside jit);
    matches ``TargetHead.preprocess`` (target_head.py:100-106).
    """
    target = shift_pad(target, left=False)
    input_ids = shift_pad(input_ids, left=False)
    if loss_mask.ndim == 2:
        loss_mask = loss_mask[..., None]
    return input_ids, target, loss_mask


def apply_target_head(
    weight: jnp.ndarray, hidden: jnp.ndarray
) -> jnp.ndarray:
    """Functional head application for use inside jitted steps."""
    return jnp.einsum("bsh,vh->bsv", hidden.astype(weight.dtype), weight)
