"""On-device augmentation for unlabeled video windows — the DALI train-pipe
equivalent (reference lightning_pose/data/dali.py:156-182).

Per sequence: rotation ~U(-10°, 10°) + anisotropic scale ~U(0.8, 1.2)²
about the image center (one warp, forward 2x3 matrix returned for the undo
step), brightness/contrast ~U(0.75, 1.25), shot noise factor ~U(0, 10).
Then /255 + ImageNet normalization happens downstream.

The returned ``(B, 2, 3)`` matrices satisfy ``augmented = M @ [x, y, 1]``;
``undo_affine_transform_batch`` inverts them after decoding keypoints
(reference data/utils.py:192-235).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lightning_pose_tpu.ops.augment import warp_bilinear

__all__ = ["augment_video_sequence"]

_ROT_DEG = 10.0
_SCALE_LO, _SCALE_HI = 0.8, 1.2
# static sampled-row span over one (8, 128) warp-kernel tile (see
# ops/augment.py:_warp_row_span_bound): the inverse linear part is
# Rot(-phi) @ diag(1/sx, 1/sy), so |dpy/dx| <= sin(rot)/s_lo and
# |dpy/dy| <= cos(rot)/s_lo. Enables the windowed Pallas contraction
# (~48 of 256 rows) on the per-step unlabeled warp — the full contraction
# was ~824 GFLOP per 32-frame window at 256px
_SPAN_BOUND = (np.sin(np.deg2rad(_ROT_DEG)) * 127.0 + 7.0) / _SCALE_LO


def augment_video_sequence(
    rng: jax.Array, frames: jax.Array, apply_geometric: bool = True
) -> tuple[jax.Array, jax.Array]:
    """Augment one unlabeled sequence ``(T, H, W, 3)`` of 0-255 floats.

    Returns (augmented frames float32 0-255, forward (T, 2, 3) matrices).
    """
    t, h, w, _ = frames.shape
    frames = frames.astype(jnp.float32)
    k_rot, k_scale, k_bright, k_contrast, k_shot, k_noise = jax.random.split(rng, 6)

    if apply_geometric:
        # one rotation+scale for the whole sequence (reference dali.py:160-168
        # samples once per pipeline iteration)
        angle = jax.random.uniform(
            k_rot, (), minval=-_ROT_DEG, maxval=_ROT_DEG
        ) * (np.pi / 180.0)
        scale = jax.random.uniform(
            k_scale, (2,), minval=_SCALE_LO, maxval=_SCALE_HI
        )
        cx, cy = w / 2.0, h / 2.0
        cos, sin = jnp.cos(angle), jnp.sin(angle)
        # forward matrix: scale then rotate about center
        a00 = cos * scale[0]
        a01 = -sin * scale[1]
        a10 = sin * scale[0]
        a11 = cos * scale[1]
        tx = cx - a00 * cx - a01 * cy
        ty = cy - a10 * cx - a11 * cy
        forward = jnp.array([[a00, a01, tx], [a10, a11, ty]], dtype=jnp.float32)

        # sample image at inverse-mapped coords
        full = jnp.concatenate(
            [forward, jnp.array([[0.0, 0.0, 1.0]], dtype=jnp.float32)], axis=0
        )
        inverse = jnp.linalg.inv(full)
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
        coords = jnp.einsum("ij,hwj->hwi", inverse, grid)[..., :2]
        coords = jnp.broadcast_to(coords[None], (t, h, w, 2))
        frames = warp_bilinear(frames, coords, row_span_bound=_SPAN_BOUND)
        transforms = jnp.broadcast_to(forward[None], (t, 2, 3))
    else:
        eye = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=jnp.float32)
        transforms = jnp.broadcast_to(eye[None], (t, 2, 3))

    # brightness / contrast (DALI brightness_contrast semantics:
    # out = brightness * (offset + contrast * (in - offset)), offset = 128)
    brightness = jax.random.uniform(k_bright, (), minval=0.75, maxval=1.25)
    contrast = jax.random.uniform(k_contrast, (), minval=0.75, maxval=1.25)
    frames = brightness * (128.0 + contrast * (frames - 128.0))

    # shot noise: gaussian approximation with variance = factor * intensity
    factor = jax.random.uniform(k_shot, (), minval=0.0, maxval=10.0)
    noise = jax.random.normal(k_noise, frames.shape, dtype=jnp.float32)
    frames = frames + noise * jnp.sqrt(jnp.maximum(frames, 0.0) * factor / 12.75)

    return jnp.clip(frames, 0.0, 255.0), transforms
