from .sharding import (
    batch_sharding,
    fetch,
    initialize_multihost,
    make_device_mesh,
    put_sharded,
    replicated_sharding,
    shard_batch,
    shard_operators,
)

__all__ = ["batch_sharding", "fetch", "initialize_multihost",
           "make_device_mesh", "put_sharded", "replicated_sharding",
           "shard_batch", "shard_operators"]
