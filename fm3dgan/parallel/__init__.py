from fm3dgan.parallel.mesh import (
    create_mesh,
    init_multihost,
    replicate,
    shard_batch,
    batch_sharding,
    replicated_sharding,
)

__all__ = [
    "create_mesh",
    "init_multihost",
    "replicate",
    "shard_batch",
    "batch_sharding",
    "replicated_sharding",
]
