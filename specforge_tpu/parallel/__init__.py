from specforge_tpu.parallel.mesh import (
    MeshConfig,
    batch_sharding,
    build_mesh,
    param_partition_spec,
    shard_pytree_like_params,
)

__all__ = [
    "MeshConfig",
    "batch_sharding",
    "build_mesh",
    "param_partition_spec",
    "shard_pytree_like_params",
]
