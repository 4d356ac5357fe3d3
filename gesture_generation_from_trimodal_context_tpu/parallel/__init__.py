from .mesh import (get_mesh, shard_batch, replicate, batch_sharding,  # noqa: F401
                   replicated_sharding)
