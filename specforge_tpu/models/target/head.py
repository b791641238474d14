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
        """
        index_files = glob.glob(os.path.join(model_path, "*.index.json"))
        if len(index_files) > 1:
            raise FileNotFoundError(
                f"Multiple index.json files found in {model_path}"
            )
        if index_files:
            with open(index_files[0]) as f:
                index = json.load(f)
            shard = index["weight_map"][lm_head_key]
            shard_path = os.path.join(model_path, shard)
        else:
            shard_path = os.path.join(model_path, "model.safetensors")
            if not os.path.exists(shard_path):
                raise FileNotFoundError(
                    f"No index.json or model.safetensors in {model_path}"
                )
        from safetensors import safe_open

        with safe_open(shard_path, framework="flax") as f:
            weight = f.get_tensor(lm_head_key)
        return cls(jnp.asarray(weight, dtype))

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
