"""Training-loop callbacks re-cast as pure schedules + device ops
(reference lightning_pose/callbacks.py:32-715).

- AnnealWeight and the LR callbacks became closed-form schedules
  (``train/schedules.py``).
- PatchMasking (curriculum random 16x16 patch zeroing for the multiview
  transformer, reference callbacks.py:191-451) is a jittable op plus a
  ratio schedule, applied inside the train step.
- The App-facing atomic-write JSON progress trackers
  (reference callbacks.py:454-627) are kept as host-side classes.
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

__all__ = [
    "patch_mask_ratio",
    "apply_patch_mask",
    "JSONTrainingProgressTracker",
    "JSONInferenceProgressTracker",
]


def patch_mask_ratio(
    step,
    init_ratio: float = 0.0,
    final_ratio: float = 0.5,
    start_step: int = 0,
    end_step: int = 1,
):
    """Linear curriculum ramp of the masked-patch fraction
    (reference callbacks.py:333-345): exactly 0 before ``start_step``
    (no masking pre-curriculum even when ``init_ratio > 0``), then
    ``init_ratio`` ramping linearly to ``final_ratio`` at ``end_step``."""
    span = max(end_step - start_step, 1)
    frac = jnp.clip((step - start_step) / span, 0.0, 1.0)
    ramp = init_ratio + frac * (final_ratio - init_ratio)
    return jnp.where(step < start_step, 0.0, ramp)


def apply_patch_mask(
    rng: jax.Array,
    images: jax.Array,
    ratio: jax.Array,
    patch_size: int = 16,
) -> jax.Array:
    """Zero a random ``ratio`` fraction of ``patch_size`` x ``patch_size``
    patches per image (reference PatchMasker, callbacks.py:313-451).

    Matches the reference's exact-count semantics: each image masks
    exactly ``floor(ratio * num_patches)`` patches (the reference draws a
    ``randperm`` prefix per view; here the k lowest of per-patch uniform
    scores — the same distribution, one sort instead of a Python loop).

    Args:
        images: ``(B, H, W, C)`` float images.
        ratio: scalar in [0, 1] (may be traced).
    """
    b, h, w, _ = images.shape
    gh, gw = h // patch_size, w // patch_size
    num_patches = gh * gw
    scores = jax.random.uniform(rng, (b, num_patches))
    n_mask = jnp.floor(ratio * num_patches).astype(jnp.int32)
    # threshold at the k-th order statistic: the k lowest scores are masked
    sorted_scores = jnp.sort(scores, axis=-1)
    thresh = sorted_scores[:, jnp.clip(n_mask, 0, num_patches - 1)]
    keep = (scores >= thresh[:, None]) & (n_mask < num_patches)
    keep = keep.reshape(b, gh, gw, 1)
    keep = jax.image.resize(
        keep.astype(images.dtype), (b, h, w, 1), method="nearest"
    )
    return images * keep


def _atomic_write_json(path: str | Path, payload: dict) -> None:
    tmp = str(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, str(path))


class JSONTrainingProgressTracker:
    """Atomic-write training progress JSON consumed by the LP App
    (reference callbacks.py:527-627)."""

    def __init__(self, status_file: str | Path | None, total_epochs: int) -> None:
        # None disables writes (non-main processes in multi-host DP)
        self.status_file = Path(status_file) if status_file is not None else None
        self.total_epochs = total_epochs

    def update(self, epoch: int, extra: dict | None = None) -> None:
        if self.status_file is None:
            return
        payload = {
            "status": "TRAINING",
            "current_epoch": int(epoch),
            "total_epochs": int(self.total_epochs),
            "progress": round(100.0 * (epoch + 1) / max(self.total_epochs, 1), 2),
            **(extra or {}),
        }
        _atomic_write_json(self.status_file, payload)


class JSONInferenceProgressTracker:
    """Atomic-write inference progress JSON with the reference's schema
    ``{"completed": N, "total": T, "timestamp": ...}`` so the LP App can
    consume it unchanged (reference callbacks.py:454-525)."""

    def __init__(self, status_file: str | Path, total_batches: int) -> None:
        import os

        self.status_file = Path(status_file)
        self.total_batches = max(int(total_batches), 1)
        self._n = 0
        os.makedirs(os.path.dirname(self.status_file) or ".", exist_ok=True)
        self._save()

    def _save(self) -> None:
        import time

        _atomic_write_json(
            self.status_file,
            {
                "completed": self._n,
                "total": self.total_batches,
                "timestamp": time.time(),
            },
        )

    def step(self) -> None:
        self._n += 1
        self._save()

    def finish(self) -> None:
        self._n = self.total_batches
        self._save()
