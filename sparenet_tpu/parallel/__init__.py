from .mesh import (
    batch_sharding,
    get_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from .pointwise import (
    get_mesh2d,
    sharded_chamfer,
    sharded_chamfer_distance,
    sharded_nn_search,
)

__all__ = [
    "get_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "replicate", "get_mesh2d", "sharded_chamfer",
    "sharded_chamfer_distance", "sharded_nn_search",
]
