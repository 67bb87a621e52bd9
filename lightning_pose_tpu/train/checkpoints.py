"""Checkpoint save/load with the reference's directory contract.

Checkpoints are written to ``<model_dir>/tb_logs/<model_name>/version_N/
checkpoints/epoch=E-step=S[-best].ckpt`` so that discovery via
``ckpt_path_from_base_path`` works identically to the reference
(reference lightning_pose/utils/io.py:38-146, callbacks.py:675-689:
best-by-``val_supervised_loss`` with ``-best`` suffix, plus optional
every-n-epochs checkpoints).

Two storage backends behind one naming contract:

- ``msgpack`` (default): one atomic flax-msgpack file per checkpoint —
  simple, fast for the model sizes here.
- ``orbax``: ``.ckpt`` is an Orbax PyTree directory written by an
  **async** checkpointer, so very large models (big ViT trunks) never
  block the train loop on host serialization (select with
  ``cfg.training.checkpoint_backend: orbax``).

``load_checkpoint`` dispatches on what is on disk (file -> msgpack,
directory -> Orbax), so readers never need to know the backend.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
from typing import Any

import flax.serialization
import jax
import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "remove_checkpoint",
    "wait_for_saves",
    "checkpoint_dir",
    "next_version_dir",
]


def next_version_dir(model_dir: str, model_name: str) -> str:
    """Return a fresh ``tb_logs/<model_name>/version_N`` directory path."""
    base = os.path.join(model_dir, "tb_logs", model_name)
    existing = glob.glob(os.path.join(glob.escape(base), "version_*"))
    versions = []
    for p in existing:
        m = re.search(r"version_(\d+)$", p)
        if m:
            versions.append(int(m.group(1)))
    version = max(versions) + 1 if versions else 0
    return os.path.join(base, f"version_{version}")


def checkpoint_dir(version_dir: str) -> str:
    d = os.path.join(version_dir, "checkpoints")
    os.makedirs(d, exist_ok=True)
    return d


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


_async_checkpointer = None


def _get_async_checkpointer():
    global _async_checkpointer
    if _async_checkpointer is None:
        import orbax.checkpoint as ocp

        _async_checkpointer = ocp.AsyncCheckpointer(
            ocp.PyTreeCheckpointHandler()
        )
    return _async_checkpointer


def save_checkpoint(
    path: str,
    params: Any,
    batch_stats: Any,
    step: int,
    epoch: int,
    extra: dict | None = None,
    backend: str = "msgpack",
) -> None:
    """Atomically write a checkpoint (msgpack file or async Orbax dir)."""
    payload = {
        "params": _to_host(params),
        "batch_stats": _to_host(batch_stats),
        "step": int(step),
        "epoch": int(epoch),
        "extra": extra or {},
    }
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = _get_async_checkpointer()
        # a pending async save to the same path must land first
        ckptr.wait_until_finished()
        if os.path.exists(path):
            remove_checkpoint(path)
        ckptr.save(
            os.path.abspath(path), args=ocp.args.PyTreeSave(payload)
        )
        return
    if backend != "msgpack":
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    data = flax.serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def wait_for_saves() -> None:
    """Block until any in-flight async (Orbax) checkpoint saves commit."""
    if _async_checkpointer is not None:
        _async_checkpointer.wait_until_finished()


def remove_checkpoint(path: str) -> None:
    """Delete a checkpoint regardless of backend (file or directory)."""
    wait_for_saves()
    if os.path.isdir(path):
        shutil.rmtree(path)
    elif os.path.exists(path):
        os.remove(path)


def load_checkpoint(path: str) -> dict:
    """Load a checkpoint into host numpy pytrees (backend auto-detected)."""
    wait_for_saves()
    if os.path.isdir(path):  # Orbax PyTree directory
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
            return ckptr.restore(os.path.abspath(path))
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())
