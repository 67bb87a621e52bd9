"""1-D data-parallel mesh utilities (single- and multi-host).

The reference scales out with Lightning DDP + NCCL (reference
train.py:411-428, SURVEY §2.2); the TPU-native equivalent is GSPMD: a 1-D
``Mesh`` over all chips, batches sharded along ``data``, parameters
replicated. Gradient all-reduce, ``sync_dist`` metric averaging, and
sync-batchnorm all fall out of XLA's partitioner — no explicit collectives
in model code.

Multi-host DP extends the same mesh over DCN: ``initialize_distributed``
brings up ``jax.distributed`` (driven by cfg.training.num_nodes or the
LP_TPU_COORDINATOR/NUM_PROCESSES/PROCESS_ID env vars; on CPU the gloo
collectives backend is selected so the path is testable without TPU pods).
Labeled batches are constructed identically on every host (same data seed)
and sliced per host via ``jax.make_array_from_callback``; unlabeled video
batches are per-host shards (each host decodes its own videos, the
reference's per-rank seeded DALI pipelines, dali.py:580-592) assembled with
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "batch_sharding",
    "shard_batch",
    "shard_local_batch",
    "shard_stacked_local_batch",
    "replicate",
]


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize ``jax.distributed`` for multi-host DP.

    Explicit args win; otherwise LP_TPU_COORDINATOR / LP_TPU_NUM_PROCESSES /
    LP_TPU_PROCESS_ID env vars; otherwise jax's own auto-detection (TPU
    pods). No-op if a multi-process runtime is already up.
    """
    # don't touch the backend here — jax.process_count() would initialize
    # XLA, and jax.distributed.initialize() must run before that
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get(
        "LP_TPU_COORDINATOR"
    )
    if num_processes is None and os.environ.get("LP_TPU_NUM_PROCESSES"):
        num_processes = int(os.environ["LP_TPU_NUM_PROCESSES"])
    if process_id is None and os.environ.get("LP_TPU_PROCESS_ID"):
        process_id = int(os.environ["LP_TPU_PROCESS_ID"])
    try:
        # CPU cross-process collectives for pod-free testing
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # option or backend not available — TPU path
        pass
    kwargs: dict[str, Any] = {}
    if coordinator_address:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    logger.info(
        f"jax.distributed up: process {jax.process_index()}/"
        f"{jax.process_count()}, {jax.device_count()} global device(s)"
    )
    # establish the cross-process collective context NOW, while processes
    # are still aligned from startup: gloo's KV-store bring-up window is
    # ~30s, and the host work between here and the first training
    # collective (dataset load, PCA fits, model-init compile) can skew
    # processes past it on loaded machines
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("lp_tpu_distributed_init")


def make_mesh(num_devices: int | None = None) -> Mesh:
    """Create a 1-D mesh over the first ``num_devices`` (global) devices."""
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


def _put_global(x: Any, sharding: NamedSharding) -> jax.Array:
    """Place host data that is identical on every process."""
    if jax.process_count() > 1:
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )
    return jax.device_put(x, sharding)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a pytree of host arrays with the batch axis sharded;
    rank-0 leaves (scalars/flags) are replicated.

    Multi-host: every process must hold the SAME global batch (seeded
    identically); each host transfers only its devices' slices.
    """
    sharding = batch_sharding(mesh)
    scalar_sharding = NamedSharding(mesh, P())

    def put(x):
        if np.ndim(x) == 0:
            return _put_global(x, scalar_sharding)
        return _put_global(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def shard_stacked_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put (steps, batch, ...) pytrees with axis 1 (batch) sharded —
    the layout consumed by the epoch-level ``lax.scan`` train loop, where
    axis 0 is the scanned step axis."""
    sharding = NamedSharding(mesh, P(None, "data"))
    scalar_sharding = NamedSharding(mesh, P())

    def put(x):
        if np.ndim(x) == 0:
            return _put_global(x, scalar_sharding)
        return _put_global(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def shard_local_batch(mesh: Mesh, batch: Any) -> Any:
    """Assemble per-process local shards into global batch-sharded arrays.

    Each host contributes its own rows (global batch = concat over hosts) —
    used for the unlabeled video stream, where every host decodes a
    different shard of videos. Single-process: identical to shard_batch.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    sharding = batch_sharding(mesh)
    scalar_sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return _put_global(x, scalar_sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)


def shard_stacked_local_batch(mesh: Mesh, batch: Any) -> Any:
    """Assemble per-process (steps, local_batch, ...) stacks into global
    (steps, global_batch, ...) arrays with axis 1 sharded — the scanned-epoch
    layout for the unlabeled video stream under multi-host DP: each host
    stacks the windows its own decode threads produced (the reference's
    per-rank DALI pipelines, dali.py:580-592), and the global batch is their
    concatenation along axis 1. Single-process: identical to
    shard_stacked_batch."""
    if jax.process_count() == 1:
        return shard_stacked_batch(mesh, batch)
    sharding = NamedSharding(mesh, P(None, "data"))
    scalar_sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0:
            return _put_global(x, scalar_sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: _put_global(x, sharding), tree)


def sync_collectives(mesh: Mesh) -> None:
    """Run one tiny all-reduce over the mesh to establish the collective
    context (gloo/ICI clique) while all processes are still in sync.

    Without this, the first real collective fires after each process's
    train-step compile — on skewed hosts that can exceed the context
    bring-up timeout (gloo's KV-store GetKeyValue is ~30s).
    """
    if jax.process_count() == 1:
        return
    n = mesh.devices.size
    warm = shard_batch(mesh, np.zeros((n,), np.float32))
    total = jax.jit(
        lambda x: x.sum(), out_shardings=NamedSharding(mesh, P())
    )(warm)
    jax.block_until_ready(total)
