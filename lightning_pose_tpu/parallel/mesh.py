"""1-D data-parallel mesh utilities.

The reference scales out with Lightning DDP + NCCL (reference
train.py:411-428, SURVEY §2.2); the TPU-native equivalent is GSPMD: a 1-D
``Mesh`` over all chips, batches sharded along ``data``, parameters
replicated. Gradient all-reduce, ``sync_dist`` metric averaging, and
sync-batchnorm all fall out of XLA's partitioner — no explicit collectives
in model code. Multi-host DP extends the same mesh over DCN via
``jax.distributed`` initialization.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "shard_batch", "replicate"]


def make_mesh(num_devices: int | None = None) -> Mesh:
    """Create a 1-D mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices but only {len(devices)} available"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a pytree of host arrays with the batch axis sharded;
    rank-0 leaves (scalars/flags) are replicated."""
    sharding = batch_sharding(mesh)
    scalar_sharding = NamedSharding(mesh, P())

    def put(x):
        if np.ndim(x) == 0:
            return jax.device_put(x, scalar_sharding)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
