from .sharding import (
    make_device_mesh, batch_sharding, replicated_sharding, shard_batch,
)

__all__ = ["make_device_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch"]
