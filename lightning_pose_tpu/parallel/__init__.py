"""Device-mesh and sharding utilities for data-parallel training."""

from lightning_pose_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_sharding"]
