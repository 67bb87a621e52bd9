"""Checkpoint save/load with the reference's directory contract.

Checkpoints are msgpack-serialized pytrees written to
``<model_dir>/tb_logs/<model_name>/version_N/checkpoints/
epoch=E-step=S[-best].ckpt`` so that discovery via
``ckpt_path_from_base_path`` works identically to the reference
(reference lightning_pose/utils/io.py:38-146, callbacks.py:675-689:
best-by-``val_supervised_loss`` with ``-best`` suffix, plus optional
every-n-epochs checkpoints).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any

import flax.serialization
import jax
import numpy as np

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
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


def save_checkpoint(
    path: str,
    params: Any,
    batch_stats: Any,
    step: int,
    epoch: int,
    extra: dict | None = None,
) -> None:
    """Atomically write a checkpoint file."""
    payload = {
        "params": _to_host(params),
        "batch_stats": _to_host(batch_stats),
        "step": int(step),
        "epoch": int(epoch),
        "extra": extra or {},
    }
    data = flax.serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    """Load a checkpoint file into host numpy pytrees."""
    with open(path, "rb") as f:
        return flax.serialization.msgpack_restore(f.read())
