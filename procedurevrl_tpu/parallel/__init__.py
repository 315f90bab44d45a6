from procedurevrl_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh,
    replicated,
    shard_batch,
)

__all__ = ["build_mesh", "batch_sharding", "replicated", "shard_batch"]
