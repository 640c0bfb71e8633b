from .distributed import initialize as distributed_initialize
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
)

__all__ = [
    "distributed_initialize",
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_tree",
]
