from .mesh import (
    batch_sharding,
    get_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "get_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "replicate",
]
