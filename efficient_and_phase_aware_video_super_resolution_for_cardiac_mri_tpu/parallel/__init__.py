from .distributed import initialize as distributed_initialize
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    SPATIAL_AXIS,
    batch_sharding,
    gather_for_compute,
    make_mesh,
    pad_height_to_multiple,
    param_spec,
    partition_tree,
    replicate_tree,
    replicated,
    shard_batch,
    video_spec,
)

__all__ = [
    "distributed_initialize",
    "DATA_AXIS",
    "SPATIAL_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "pad_height_to_multiple",
    "batch_sharding",
    "gather_for_compute",
    "replicated",
    "shard_batch",
    "video_spec",
    "param_spec",
    "partition_tree",
    "replicate_tree",
]
