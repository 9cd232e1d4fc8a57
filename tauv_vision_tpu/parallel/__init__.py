from tauv_vision_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    has_model_axis,
    replicate,
    replicated,
    shard_batch,
    small_map_guard,
    spatial_sharding,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "create_mesh",
    "has_model_axis",
    "replicate",
    "replicated",
    "shard_batch",
    "small_map_guard",
    "spatial_sharding",
]
