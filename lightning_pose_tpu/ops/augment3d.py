"""3D scale/translate augmentation for calibrated multiview batches
(reference lightning_pose/data/datasets.py:825-1120).

The reference implements this per-sample on CPU: triangulate the labeled
keypoints to 3D, perturb with a random global scale/translation, reproject
into every camera, estimate a per-view affine warp from the old to the new
keypoint positions (cv2.estimateAffinePartial2D), and warp the images.

Here the whole pipeline is a batched jittable op: DLT triangulation and
projection reuse ``data/cameras.py``; the per-view affine is a closed-form
similarity-transform least-squares fit (Umeyama without rotation removal —
scale + rotation + translation); the warp is one bilinear gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lightning_pose_tpu.data.cameras import (
    project_3d_to_2d,
    project_camera_pairs_to_3d,
)
from lightning_pose_tpu.ops.augment import warp_bilinear

__all__ = ["apply_3d_transforms", "fit_similarity_transform"]


def fit_similarity_transform(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Least-squares similarity transform (scale*R + t) mapping src -> dst.

    NaN pairs are excluded. Args: (K, 2) each. Returns forward 3x3 matrix.

    Degenerate fits fall back to the identity: fewer than 2 valid pairs, or
    all valid points coincident (the reference's
    cv2.estimateAffinePartial2D likewise fails there and the sample is
    left unaugmented, reference datasets.py:855-980).
    """
    valid = ~(jnp.isnan(src).any(axis=1) | jnp.isnan(dst).any(axis=1))
    n_valid = jnp.sum(valid)
    wsum = jnp.maximum(n_valid, 1.0)
    w = valid.astype(jnp.float32)[:, None]
    src0 = jnp.nan_to_num(src, nan=0.0)
    dst0 = jnp.nan_to_num(dst, nan=0.0)
    mu_s = jnp.sum(src0 * w, axis=0) / wsum
    mu_d = jnp.sum(dst0 * w, axis=0) / wsum
    sc = (src0 - mu_s) * w
    dc = (dst0 - mu_d) * w
    # similarity params (a, b): [[a, -b], [b, a]]
    spread = jnp.sum(sc**2)
    denom = spread + 1e-8
    a = jnp.sum(sc * dc) / denom
    b = jnp.sum(sc[:, 0] * dc[:, 1] - sc[:, 1] * dc[:, 0]) / denom
    rot = jnp.array([[a, -b], [b, a]], dtype=jnp.float32)
    t = mu_d - rot @ mu_s
    m = jnp.array(
        [
            [rot[0, 0], rot[0, 1], t[0]],
            [rot[1, 0], rot[1, 1], t[1]],
            [0.0, 0.0, 1.0],
        ],
        dtype=jnp.float32,
    )
    degenerate = (n_valid < 2) | (spread < 1e-6)
    return jnp.where(degenerate, jnp.eye(3, dtype=jnp.float32), m)


def apply_3d_transforms(
    rng: jax.Array,
    images: jax.Array,
    keypoints_frame: jax.Array,
    intrinsics: jax.Array,
    extrinsics: jax.Array,
    distortions: jax.Array,
    frame_to_model: jax.Array | None = None,
    scale_range: tuple[float, float] = (0.8, 1.2),
    translate_range: float = 0.1,
    apply_prob: float = 0.5,
) -> tuple[jax.Array, jax.Array]:
    """Batched 3D scale/translate augmentation.

    Args:
        images: (B, V, H, W, 3) float 0-255 model-resolution frames.
        keypoints_frame: (B, V*K, 2) view-major keypoints in ORIGINAL frame
            coordinates (the space the cameras are calibrated in; NaN where
            missing).
        intrinsics/extrinsics/distortions: (B, V, 3, 3)/(B, V, 3, 4)/(B, V, 5).
        frame_to_model: optional (B, V, 3, 3) affine mapping frame coords to
            model (resized) coords; identity when None.

    Returns:
        (augmented model-res images, transformed keypoints in MODEL coords,
        both same shapes as inputs).
    """
    b, v, h, w, _ = images.shape
    k = keypoints_frame.shape[1] // v
    kp_views = keypoints_frame.reshape(b, v, k, 2)
    if frame_to_model is None:
        eye = jnp.eye(3, dtype=jnp.float32)
        frame_to_model = jnp.broadcast_to(eye, (b, v, 3, 3))

    key_s, key_t, key_p = jax.random.split(rng, 3)
    apply = jax.random.uniform(key_p, (b,)) < apply_prob
    scale = jax.random.uniform(
        key_s, (b, 1, 1), minval=scale_range[0], maxval=scale_range[1]
    )

    # triangulate labels -> (B, K, 3) via nanmedian over camera pairs
    pts3d_pairs = project_camera_pairs_to_3d(
        kp_views, intrinsics, extrinsics, distortions
    )
    pts3d = jnp.nanmedian(pts3d_pairs, axis=1)  # (B, K, 3)

    # fewer than 3 valid triangulated keypoints -> skip augmentation for
    # that sample (reference datasets.py:1017-1030)
    valid_3d = jnp.sum(~jnp.isnan(pts3d).any(axis=-1), axis=1)  # (B,)
    apply = apply & (valid_3d >= 3)

    # perturb: global scale about the centroid + translation scaled to the
    # scene extent (reference datasets.py:825-980)
    centroid = jnp.nanmean(pts3d, axis=1, keepdims=True)
    extent = jnp.nanmax(
        jnp.nan_to_num(
            jnp.abs(pts3d - centroid), nan=0.0
        ),
        axis=(1, 2),
        keepdims=True,
    )
    translate = (
        jax.random.uniform(key_t, (b, 1, 3), minval=-1.0, maxval=1.0)
        * translate_range
        * extent.reshape(b, 1, 1)
    )
    pts3d_new = (pts3d - centroid) * scale + centroid + translate

    # reproject into every camera -> new 2D keypoints (frame coords)
    kp_new_frame = project_3d_to_2d(pts3d_new, intrinsics, extrinsics, distortions)
    # keep NaNs where the original label was missing
    kp_new_frame = jnp.where(jnp.isnan(kp_views), jnp.nan, kp_new_frame)

    # move both old and new keypoints into model (resized) coords so the
    # image warp is fitted in the space the pixels live in
    def to_model(m, kp):
        homog = jnp.concatenate([kp, jnp.ones_like(kp[..., :1])], axis=-1)
        return jnp.einsum("ij,kj->ki", m, homog)[..., :2]

    kp_old_model = jax.vmap(jax.vmap(to_model))(frame_to_model, kp_views)
    kp_new = jax.vmap(jax.vmap(to_model))(frame_to_model, kp_new_frame)
    kp_new = jnp.where(jnp.isnan(kp_views), jnp.nan, kp_new)

    # fit a per-(sample, view) similarity warp old -> new, then warp all
    # (B*V) images in ONE batched sample so the TPU matmul warp kernel
    # applies (vmapped per-image gathers are the TPU bottleneck)
    def per_view_inverse(kp_old, kp_nv):
        return jnp.linalg.inv(fit_similarity_transform(kp_old, kp_nv))

    invs = jax.vmap(jax.vmap(per_view_inverse))(kp_old_model, kp_new)
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)
    coords = jnp.einsum("bvij,hwj->bvhwi", invs, grid)[..., :2]
    warped = warp_bilinear(
        images.reshape(b * v, h, w, -1), coords.reshape(b * v, h, w, 2)
    ).reshape(images.shape)

    # only apply for selected samples
    apply_img = apply[:, None, None, None, None]
    out_images = jnp.where(apply_img, warped, images)
    out_kp = jnp.where(apply[:, None, None, None], kp_new, kp_old_model)
    return out_images, out_kp.reshape(b, v * k, 2)
