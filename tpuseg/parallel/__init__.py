from tpuseg.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    pad_to_multiple,
)
from tpuseg.parallel.spatial import (
    make_semantic_spatial,
    shard_spatial,
    spatial_sharding,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
    "make_semantic_spatial",
    "shard_spatial",
    "spatial_sharding",
]
