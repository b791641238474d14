"""Device mesh construction + sharding rules.

The trainer topology maps the reference's process-group design
(specforge/distributed.py:133-351, FSDP backend.py:151-434) onto one
`jax.sharding.Mesh` with axes:

- ``dp``         — pure data parallelism (ref: FSDP replica groups / DDP).
- ``fsdp``       — parameter + optimizer-state sharding (ref: FSDP
                   SHARD_GRAD_OP/FULL_SHARD); batch is *also* sharded over this
                   axis (ZeRO-style data parallelism), XLA inserts the
                   all-gathers/reduce-scatters the wrapper classes did by hand.
- ``sp_ulysses`` / ``sp_ring`` — sequence parallelism for USP long-context
                   (ref: yunchang Ulysses all-to-all × ring flash attention).

Parameters are sharded by a simple, explicit rule: the largest dimension
divisible by the fsdp size carries the ``fsdp`` axis; everything else is
replicated. Small leaves (below ``min_shard_bytes``) stay replicated to avoid
collective overhead on tiny tensors.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("dp", "fsdp", "sp_ulysses", "sp_ring")
# batch axis rides all data-parallel-ish axes
BATCH_AXES = ("dp", "fsdp")
SP_AXES = ("sp_ulysses", "sp_ring")

MIN_SHARD_BYTES = 2 ** 18  # leaves smaller than this stay replicated


@dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    fsdp: int = 1
    sp_ulysses: int = 1
    sp_ring: int = 1

    @property
    def world_size(self) -> int:
        return self.dp * self.fsdp * self.sp_ulysses * self.sp_ring

    @classmethod
    def auto(cls, n_devices: Optional[int] = None) -> "MeshConfig":
        """Default: all devices on the fsdp axis (ZeRO-style DP)."""
        n = n_devices if n_devices is not None else jax.device_count()
        return cls(fsdp=n)


def build_mesh(config: MeshConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if config.world_size != len(devices):
        raise ValueError(
            f"mesh {config} needs {config.world_size} devices, have "
            f"{len(devices)}"
        )
    arr = np.asarray(devices).reshape(
        config.dp, config.fsdp, config.sp_ulysses, config.sp_ring
    )
    return Mesh(arr, MESH_AXES)


def param_partition_spec(
    leaf: Any, fsdp_size: int, min_shard_bytes: int = MIN_SHARD_BYTES
) -> P:
    """fsdp PartitionSpec for one parameter leaf (largest divisible dim)."""
    shape = getattr(leaf, "shape", ())
    if fsdp_size <= 1 or not shape:
        return P()
    nbytes = int(np.prod(shape)) * getattr(leaf.dtype, "itemsize", 4)
    if nbytes < min_shard_bytes:
        return P()
    candidates = [
        (dim_size, i) for i, dim_size in enumerate(shape)
        if dim_size % fsdp_size == 0
    ]
    if not candidates:
        return P()
    _, axis = max(candidates)
    spec = [None] * len(shape)
    spec[axis] = "fsdp"
    return P(*spec)


def shard_pytree_like_params(tree: Any, mesh: Mesh) -> Any:
    """Device-put every leaf with its fsdp sharding rule applied."""
    fsdp_size = mesh.shape["fsdp"]

    def _put(leaf):
        spec = param_partition_spec(leaf, fsdp_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, tree)


def param_spec_tree(tree: Any, mesh: Mesh) -> Any:
    fsdp_size = mesh.shape["fsdp"]
    return jax.tree_util.tree_map(
        lambda leaf: param_partition_spec(leaf, fsdp_size), tree
    )


def batch_sharding(
    mesh: Mesh,
    seq_axis_sharded: bool = False,
    leading_accum: bool = True,
) -> NamedSharding:
    """Sharding for batch tensors: batch over (dp, fsdp), sequence over the sp
    axes when sequence parallelism is active.

    ``leading_accum``: tensors carry a leading micro-step axis
    ``[accum, batch, ...]`` (the train-step layout) which stays unsharded.
    """
    spec = [None] if leading_accum else []
    spec.append(BATCH_AXES)
    if seq_axis_sharded:
        spec.append(SP_AXES)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
