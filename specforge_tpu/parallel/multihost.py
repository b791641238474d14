"""Multi-host (multi-process) runtime support.

The reference scales trainers across hosts with torch.distributed process
groups (specforge/launch.py:1432-1539, controller.py:817-828); the TPU-native
equivalent is the JAX distributed runtime: one process per host, a global
device mesh over all chips, and per-host *local* data assembled into global
arrays (``jax.make_array_from_process_local_data``) so the jitted train step
sees one logical batch while each host feeds only its own samples.

Pieces:

- :func:`maybe_initialize_distributed` — env-driven
  ``jax.distributed.initialize`` (must run before any backend-touching jax
  call; no-op on a single host).
- :func:`process_index` / :func:`process_count` / :func:`is_primary` — host
  identity for rank0-gated IO (checkpoint metadata, trackers, markers), the
  role of the reference's rank0-broadcast decisions.
- :func:`barrier` — host-level sync (`sync_global_devices`).
- :func:`make_global_batch` — per-host shards → global jax.Arrays.
- :func:`shard_refs_for_process` — deterministic per-host ref sharding that
  composes with the batch sharding: within each global batch of ``G`` samples
  the process owning mesh rows ``[p*L, (p+1)*L)`` receives exactly those
  refs, so the assembled global batch is identical to the single-process
  order (the parity-gate requirement; ref launch.py:174-219).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional, Sequence

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
    SPECFORGE_PROCESS_ID. Returns True when running multi-process after the
    call. Safe to call more than once. IMPORTANT: the first call must happen
    before any jax computation touches a backend.
    """
    global _INITIALIZED
    coordinator_address = coordinator_address or os.environ.get(
        "SPECFORGE_COORDINATOR"
    )
    if _INITIALIZED:
        import jax

        return jax.process_count() > 1
    if coordinator_address is None:
        # externally initialized (e.g. launcher called jax.distributed itself)?
        try:
            from jax._src import distributed as _jd

            if _jd.global_state.client is not None:
                _INITIALIZED = True
                import jax

                return jax.process_count() > 1
        except Exception:  # pragma: no cover - internal-API drift guard
            pass
        return False
    import jax

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


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    return process_index() == 0


def barrier(name: str) -> None:
    """Host-level barrier; no-op single-process."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def make_global_batch(
    local_tensors: Dict[str, np.ndarray], sharding_map: Dict[str, Any]
) -> Dict[str, Any]:
    """Per-host local shards → global jax.Arrays with the given shardings."""
    import jax

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


def process_batch_blocks(mesh, proc_index: Optional[int] = None):
    """This process's slice of the flattened ``(dp, fsdp)`` batch-block axis.

    Returns ``(first_block, n_blocks_mine, n_blocks_total)``. With sequence
    parallelism the sp axes may span processes: processes in the same batch
    block then hold the SAME samples (each materializing its own sequence
    chunk at device_put time) — the TPU-native equivalent of the reference's
    per-SP-rank pre-sharded dataset (``process_data_usp``,
    specforge/data/preprocessing.py:109-394).
    """
    import jax

    devs = mesh.devices  # ndarray [dp, fsdp, sp_u, sp_r]
    fsdp = devs.shape[1]
    pid = jax.process_index() if proc_index is None else proc_index
    blocks = sorted(
        {
            idx[0] * fsdp + idx[1]
            for idx, dev in np.ndenumerate(devs)
            if dev.process_index == pid
        }
    )
    if not blocks:
        raise ValueError(f"process {pid} owns no devices in mesh {mesh}")
    if blocks != list(range(blocks[0], blocks[0] + len(blocks))):
        raise ValueError(
            f"process {pid} owns non-contiguous batch blocks {blocks}; "
            "reorder mesh axes so dp/fsdp are outermost per process"
        )
    return blocks[0], len(blocks), devs.shape[0] * fsdp


def shard_refs_for_process(
    refs: Sequence[Any],
    global_batch_size: int,
    *,
    proc_index: Optional[int] = None,
    proc_count: Optional[int] = None,
    mesh=None,
) -> List[Any]:
    """Slice an ordered global ref list down to this process's share.

    The global batch ``g`` covers refs ``[g*G, (g+1)*G)``; mesh batch rows are
    laid out process-major (``jax.devices()`` orders local devices of process
    0 first), so process ``p`` owns rows ``[p*L, (p+1)*L)`` of every batch
    with ``L = G / proc_count``. A trailing partial global batch is dropped
    on every process alike (drop_last), keeping per-process batch counts
    equal — the property that makes eval/collective schedules deadlock-free
    (ref eval/evaluator.py:27-222).
    """
    n = proc_count if proc_count is not None else process_count()
    if n <= 1:
        return list(refs)
    if mesh is not None:
        first, mine, total = process_batch_blocks(mesh, proc_index)
        if global_batch_size % total != 0:
            raise ValueError(
                f"global batch {global_batch_size} not divisible by "
                f"{total} batch blocks (dp*fsdp)"
            )
        per_block = global_batch_size // total
        start, local = first * per_block, mine * per_block
    else:
        p = proc_index if proc_index is not None else process_index()
        if global_batch_size % n != 0:
            raise ValueError(
                f"global batch {global_batch_size} not divisible by "
                f"{n} processes"
            )
        local = global_batch_size // n
        start = p * local
    n_batches = len(refs) // global_batch_size
    dropped = len(refs) - n_batches * global_batch_size
    if dropped:
        logger.info(
            "shard_refs_for_process: dropping %d trailing refs (partial "
            "global batch)", dropped,
        )
    out: List[Any] = []
    for g in range(n_batches):
        base = g * global_batch_size + start
        out.extend(refs[base: base + local])
    return out
