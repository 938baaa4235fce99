from tpuseg.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    pad_to_multiple,
)
from tpuseg.parallel.spatial import (
    make_infer_spatial,
    make_semantic_spatial,
    make_train_spatial,
    replicate_state,
    shard_spatial,
    shard_train_batch,
    spatial_sharding,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
    "make_infer_spatial",
    "make_semantic_spatial",
    "make_train_spatial",
    "replicate_state",
    "shard_spatial",
    "shard_train_batch",
    "spatial_sharding",
]
