"""Small shared utilities (jax-side)."""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import jax.numpy as jnp

logger = logging.getLogger("specforge_tpu")


def shift_pad(x: jnp.ndarray, left: bool = True) -> jnp.ndarray:
    """Shift a [B, S, ...] array one step along the sequence axis, zero-filling.

    ``left=True``  → prepend a zero row, drop the last (shift right in time).
    ``left=False`` → drop the first row, append a zero (shift left in time).

    Matches the reference ``padding`` helper (specforge/utils.py:129-135) used
    for the teacher shift and the TTT between-step input shift.
    """
    zeros = jnp.zeros_like(x[:, -1:])
    if left:
        return jnp.concatenate([zeros, x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], zeros], axis=1)


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def print_once(msg: str) -> None:
    if is_coordinator():
        logger.info(msg)


def env_flag(name: str, default: bool = False) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in ("1", "true", "yes", "on")


def cast_tree(tree: Any, dtype) -> Any:
    """Cast every floating-point leaf of a pytree to ``dtype``."""
    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)


def tree_nbytes(tree: Any) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype")
    )
