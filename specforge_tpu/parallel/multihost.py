"""Multi-host hooks.

- :func:`maybe_initialize_distributed` — env-driven
  ``jax.distributed.initialize`` (coordinator address + process counts from
  the standard env vars, no-op on a single host / when already initialized).
- :func:`make_global_batch` — assemble a globally-sharded device array from
  each host's local shard (``jax.make_array_from_process_local_data``), so
  the jitted train step sees one logical batch while every host feeds only
  its own samples (dp across hosts rides DCN; SURVEY §5 mapping).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

logger = logging.getLogger("specforge_tpu.multihost")

_INITIALIZED = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime when multi-host env is present.

    Env fallbacks: SPECFORGE_COORDINATOR, SPECFORGE_NUM_PROCESSES,
    SPECFORGE_PROCESS_ID (or the JAX_* equivalents jax reads natively).
    Returns True when running multi-process after the call.
    """
    global _INITIALIZED
    if _INITIALIZED or jax.process_count() > 1:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "SPECFORGE_COORDINATOR"
    )
    if coordinator_address is None:
        return False
    num_processes = num_processes or int(
        os.environ.get("SPECFORGE_NUM_PROCESSES", "1")
    )
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("SPECFORGE_PROCESS_ID", "0"))
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    logger.info(
        "jax distributed initialized: process %d/%d (devices=%d local, %d global)",
        process_id, num_processes, jax.local_device_count(),
        jax.device_count(),
    )
    return num_processes > 1


def make_global_batch(
    local_tensors: Dict[str, np.ndarray], sharding_map: Dict[str, Any]
) -> Dict[str, Any]:
    """Per-host local shards → global jax.Arrays with the given shardings."""
    out = {}
    for name, local in local_tensors.items():
        sharding = sharding_map.get(name)
        if sharding is None:
            out[name] = jax.device_put(local)
        else:
            out[name] = jax.make_array_from_process_local_data(
                sharding, np.asarray(local)
            )
    return out
