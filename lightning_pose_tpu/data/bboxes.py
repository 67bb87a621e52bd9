"""Bounding-box coordinate-space transforms — pure, jittable.

Same three coordinate spaces as the reference (reference
lightning_pose/data/bboxes.py): **frame** (original full-resolution pixels),
**norm** ([0, 1] relative to the bbox), and **model** (pixels in the resized
model input). Bboxes are ``[x, y, h, w]``.

Unlike the reference's in-place torch ops, every function here is pure and
returns a new array (functional JAX semantics). Batch wrappers mirror the
reference's context-batch edge handling (drop first/last 2 bbox rows when the
keypoint batch is 4 shorter than the bbox batch, reference bboxes.py:64-68)
and per-view bbox slices for multiview.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "frame_to_norm",
    "norm_to_frame",
    "model_to_norm",
    "norm_to_model",
    "frame_to_model",
    "model_to_frame",
    "frame_to_model_batch",
    "model_to_frame_batch",
]


def _maybe_trim_context(keypoints: jax.Array, bbox: jax.Array) -> jax.Array:
    """Drop first/last 2 bbox rows for context batches (reference bboxes.py:64-68)."""
    if keypoints.shape[0] == bbox.shape[0]:
        return bbox
    return bbox[2:-2]


def frame_to_norm(keypoints: jax.Array, bbox: jax.Array) -> jax.Array:
    """frame -> norm. keypoints ``(B, K, 2)``, bbox ``(B, 4)`` as [x, y, h, w]."""
    bbox = _maybe_trim_context(keypoints, bbox)
    x = (keypoints[:, :, 0] - bbox[:, 0:1]) / bbox[:, 3:4]
    y = (keypoints[:, :, 1] - bbox[:, 1:2]) / bbox[:, 2:3]
    return jnp.stack([x, y], axis=-1)


def norm_to_frame(keypoints: jax.Array, bbox: jax.Array) -> jax.Array:
    """norm -> frame. keypoints ``(B, K, 2)``, bbox ``(B, 4)`` as [x, y, h, w]."""
    bbox = _maybe_trim_context(keypoints, bbox)
    x = keypoints[:, :, 0] * bbox[:, 3:4] + bbox[:, 0:1]
    y = keypoints[:, :, 1] * bbox[:, 2:3] + bbox[:, 1:2]
    return jnp.stack([x, y], axis=-1)


def model_to_norm(
    keypoints: jax.Array, model_width: float, model_height: float
) -> jax.Array:
    """model -> norm."""
    return keypoints / jnp.asarray([model_width, model_height], dtype=keypoints.dtype)


def norm_to_model(
    keypoints: jax.Array, model_width: float, model_height: float
) -> jax.Array:
    """norm -> model."""
    return keypoints * jnp.asarray([model_width, model_height], dtype=keypoints.dtype)


def frame_to_model(
    keypoints: jax.Array, bbox: jax.Array, model_width: float, model_height: float
) -> jax.Array:
    """frame -> model (frame_to_norm then norm_to_model)."""
    return norm_to_model(frame_to_norm(keypoints, bbox), model_width, model_height)


def model_to_frame(
    keypoints: jax.Array, bbox: jax.Array, model_width: float, model_height: float
) -> jax.Array:
    """model -> frame (model_to_norm then norm_to_frame)."""
    return norm_to_frame(model_to_norm(keypoints, model_width, model_height), bbox)


def frame_to_model_batch(
    frame_keypoints: jax.Array,
    bbox: jax.Array,
    model_width: float,
    model_height: float,
) -> jax.Array:
    """Multiview frame -> model (reference bboxes.py:192).

    Args:
        frame_keypoints: ``(batch, num_views, num_keypoints, 2)``.
        bbox: ``(batch, num_views * 4)``; per-view slices ``[4v:4v+4]``.
    """
    num_views = frame_keypoints.shape[1]
    bbox_views = bbox.reshape(bbox.shape[0], num_views, 4)

    def one_view(kp_v: jax.Array, bbox_v: jax.Array) -> jax.Array:
        return frame_to_model(kp_v, bbox_v, model_width, model_height)

    return jax.vmap(one_view, in_axes=(1, 1), out_axes=1)(frame_keypoints, bbox_views)


def model_to_frame_batch(
    model_keypoints: jax.Array,
    bbox: jax.Array,
    model_width: float,
    model_height: float,
    num_views: int = 1,
) -> jax.Array:
    """model -> frame over a flat ``(batch, num_targets)`` layout
    (reference bboxes.py:220).

    For multiview, the keypoint axis is contiguous per view and ``bbox`` holds
    ``num_views * 4`` columns.
    """
    num_targets = model_keypoints.shape[1]
    num_keypoints = num_targets // 2
    kp = model_keypoints.reshape(-1, num_keypoints, 2)
    kp = model_to_norm(kp, model_width, model_height)
    if num_views > 1:
        per_view = num_keypoints // num_views
        kp_views = kp.reshape(-1, num_views, per_view, 2)
        bbox_views = _maybe_trim_context(kp, bbox).reshape(-1, num_views, 4)
        out = jax.vmap(norm_to_frame, in_axes=(1, 1), out_axes=1)(kp_views, bbox_views)
        kp = out.reshape(-1, num_keypoints, 2)
    else:
        kp = norm_to_frame(kp, bbox)
    return kp.reshape(-1, num_targets)
