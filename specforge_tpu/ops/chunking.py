"""Checkpointed chunk reduction.

Generic additive-terms reduction over slices of an anchor dimension with
rematerialization — bounds the DFlash-family full-vocab logit memory
(reference: core/chunking.py:15, ``checkpointed_chunk_reduce``). The chunked
function runs under ``jax.checkpoint`` inside a ``lax.scan``, so each chunk's
large intermediates (e.g. [chunk*block, vocab] logits) are recomputed in the
backward pass instead of stored.

Chunks must tile the axis exactly; callers pad with zero-weight blocks (the
weight-mask gating makes padded blocks contribute zero to every term).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def checkpointed_chunk_reduce(
    fn: Callable,
    *arrays,
    chunk_size: int,
    axis: int = 1,
    initializing: bool = False,
):
    """Sum ``fn(*chunked_arrays)`` over chunks of ``axis``.

    ``fn`` maps same-rank chunked arrays to a tuple of additive terms (scalars
    or fixed-shape arrays). ``chunk_size == 0`` disables chunking. ``None``
    arrays pass through as ``None`` (optional inputs).

    ``initializing``: set by flax callers during ``module.init`` — parameter
    creation inside ``jax.checkpoint``/``lax.scan`` traces leaks tracers into
    the variable store, so the init pass uses a plain unrolled loop instead.
    """
    sizes = {a.shape[axis] for a in arrays if a is not None}
    if len(sizes) != 1:
        raise ValueError(f"inconsistent chunk-axis sizes: {sizes}")
    n = sizes.pop()
    if chunk_size <= 0 or chunk_size >= n:
        return fn(*arrays)
    if n % chunk_size != 0:
        raise ValueError(
            f"chunk_size {chunk_size} must divide axis size {n}; pad with "
            "zero-weight blocks"
        )
    n_chunks = n // chunk_size

    present = [a is not None for a in arrays]

    def to_chunks(a):
        moved = jnp.moveaxis(a, axis, 0)
        return moved.reshape(n_chunks, chunk_size, *moved.shape[1:])

    stacked = [to_chunks(a) for a in arrays if a is not None]

    def chunk_fn_plain(*chunks):
        it = iter(chunks)
        full = [
            jnp.moveaxis(next(it), 0, axis) if p else None for p in present
        ]
        return fn(*full)

    if initializing:
        totals = chunk_fn_plain(*[c[0] for c in stacked])
        for i in range(1, n_chunks):
            totals = jax.tree_util.tree_map(
                jnp.add, totals, chunk_fn_plain(*[c[i] for c in stacked])
            )
        return totals

    chunk_fn = jax.checkpoint(chunk_fn_plain)
    first = chunk_fn(*[c[0] for c in stacked])
    if n_chunks == 1:
        return first
    rest = tuple(c[1:] for c in stacked)
    totals, _ = jax.lax.scan(
        lambda carry, xs: (
            jax.tree_util.tree_map(jnp.add, carry, chunk_fn(*xs)),
            None,
        ),
        first,
        rest,
    )
    return totals
