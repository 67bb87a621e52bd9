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
    "latest_version_dir",
    "find_resume_checkpoint",
    "resolve_checkpoint_path",
    "warm_start",
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
    opt_state: Any = None,
) -> None:
    """Atomically write a checkpoint (msgpack file or async Orbax dir).

    ``opt_state`` (the optax optimizer state) is included only in resume
    checkpoints — weights-only checkpoints stay small and load-compatible.
    """
    payload = {
        "params": _to_host(params),
        "batch_stats": _to_host(batch_stats),
        "step": int(step),
        "epoch": int(epoch),
        "extra": extra or {},
    }
    if opt_state is not None:
        payload["opt_state"] = flax.serialization.to_state_dict(
            _to_host(opt_state)
        )
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


def latest_version_dir(model_dir: str, model_name: str) -> str | None:
    """Highest existing ``version_N`` dir for a model, or None."""
    pattern = os.path.join(
        model_dir, "tb_logs", glob.escape(model_name), "version_*"
    )
    versions = []
    for d in glob.glob(pattern):
        m = re.search(r"version_(\d+)$", d)
        if m and os.path.isdir(d):
            versions.append((int(m.group(1)), d))
    return max(versions)[1] if versions else None


def find_resume_checkpoint(model_dir: str, model_name: str) -> str | None:
    """Locate the newest ``*-last.ckpt`` (full training state incl. optimizer)
    in the highest version dir — the auto-resume entry point after a
    preemption (TPU-VM spot instances)."""
    vdir = latest_version_dir(model_dir, model_name)
    if vdir is None:
        return None
    matches = glob.glob(os.path.join(vdir, "checkpoints", "*-last.ckpt"))
    if not matches:
        return None

    def _step(f: str) -> int:
        m = re.search(r"step=(\d+)", f)
        return int(m.group(1)) if m else -1

    return max(matches, key=_step)


def resolve_checkpoint_path(path: str) -> str:
    """Resolve a ``cfg.model.checkpoint`` value to a loadable checkpoint.

    The reference accepts either a ``.ckpt`` file or a model DIRECTORY, in
    which case the first ``**/*.ckpt`` found recursively is used
    (reference models/factory.py:213-215). Orbax-backend checkpoints are
    themselves directories named ``*.ckpt``, so those are matched too.
    """
    if not os.path.isdir(path) or path.endswith(".ckpt"):
        return path
    matches = sorted(glob.glob(os.path.join(path, "**", "*.ckpt"), recursive=True))
    if not matches:
        raise FileNotFoundError(f"no *.ckpt found under model directory {path}")
    return matches[0]


def warm_start(params: Any, batch_stats: Any, path: str) -> tuple[Any, Any, bool]:
    """Warm-start model variables from ``cfg.model.checkpoint``.

    Mirrors the reference's semantics (models/factory.py:211-229): load the
    full state when it is compatible; on any structure/shape mismatch
    (e.g. a different head size because ``num_keypoints`` changed), fall
    back to loading only the backbone weights.

    Returns ``(params, batch_stats, full_load)`` where ``full_load`` is
    False when only the backbone could be restored.
    """
    ckpt = load_checkpoint(resolve_checkpoint_path(path))

    def _restore(target: Any, state: Any) -> Any:
        restored = flax.serialization.from_state_dict(target, state)
        # from_state_dict does not validate leaf shapes; do it here so a
        # head mismatch triggers the backbone-only fallback instead of a
        # shape error mid-training
        for a, b in zip(
            jax.tree.leaves(target), jax.tree.leaves(restored), strict=True
        ):
            if np.shape(a) != np.shape(b):
                raise ValueError(
                    f"shape mismatch {np.shape(a)} vs {np.shape(b)}"
                )
        return restored

    try:
        params = _restore(params, ckpt["params"])
        if batch_stats and ckpt.get("batch_stats"):
            batch_stats = _restore(batch_stats, ckpt["batch_stats"])
        return params, batch_stats, True
    except (ValueError, KeyError, TypeError):
        pass
    # backbone-only fallback (reference models/factory.py:224-229)
    params = dict(params)
    params["backbone"] = _restore(params["backbone"], ckpt["params"]["backbone"])
    if batch_stats and ckpt.get("batch_stats", {}).get("backbone") is not None:
        batch_stats = dict(batch_stats)
        batch_stats["backbone"] = _restore(
            batch_stats["backbone"], ckpt["batch_stats"]["backbone"]
        )
    return params, batch_stats, False
