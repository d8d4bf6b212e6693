from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    batch_sharding_2d,
    create_mesh,
    replicated,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "batch_sharding_2d",
    "create_mesh",
    "replicated",
    "shard_params",
]
