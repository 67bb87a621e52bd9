"""Differentiable camera geometry in JAX
(reference lightning_pose/data/cameras.py:22-244).

- pairwise 2D -> 3D triangulation over all camera pairs (DLT, the same
  linear system kornia's ``triangulate_points`` solves), NaN-masked,
- 3D -> 2D projection with radial/tangential distortion (Brown-Conrady,
  matching kornia ``distort_points`` / cv2 conventions),
- a non-differentiable ``triangulate_fast`` host path (numpy) with
  nanmedian over pairs, the aniposelib-style utility the reference exposes
  (reference cameras.py:174-244).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "CameraGroup",
    "triangulate_pair",
    "project_camera_pairs_to_3d",
    "project_3d_to_2d",
    "distort_points",
    "undistort_points",
    "triangulate_fast",
]


def _projection_matrices(intrinsics: jax.Array, extrinsics: jax.Array) -> jax.Array:
    """P = K @ [R|t] per camera. intrinsics (V, 3, 3), extrinsics (V, 3, 4)."""
    return jnp.einsum("vij,vjk->vik", intrinsics, extrinsics)


def triangulate_pair(
    p1: jax.Array, p2: jax.Array, pts1: jax.Array, pts2: jax.Array
) -> jax.Array:
    """DLT triangulation for one camera pair.

    Args:
        p1/p2: (3, 4) projection matrices.
        pts1/pts2: (..., 2) undistorted pixel coords in each view.

    Returns:
        (..., 3) world points.
    """
    # rows of A: x * P3 - P1, y * P3 - P2 for each view
    def rows(p, pts):
        x = pts[..., 0:1]
        y = pts[..., 1:2]
        r1 = x * p[2] - p[0]
        r2 = y * p[2] - p[1]
        return jnp.stack([r1, r2], axis=-2)  # (..., 2, 4)

    a = jnp.concatenate([rows(p1, pts1), rows(p2, pts2)], axis=-2)  # (..., 4, 4)
    # solve via eigendecomposition of A^T A (smallest eigenvector);
    # equivalent to the SVD null-space and differentiable in JAX
    ata = jnp.einsum("...ij,...ik->...jk", a, a)
    _, vecs = jnp.linalg.eigh(ata)
    x = vecs[..., 0]  # eigenvector of smallest eigenvalue
    return x[..., :3] / (x[..., 3:4] + 1e-12)


def distort_points(points: jax.Array, intrinsics: jax.Array, dist: jax.Array) -> jax.Array:
    """Apply Brown-Conrady distortion to pixel points.

    Args:
        points: (..., 2) pixel coords.
        intrinsics: (3, 3).
        dist: (5,) [k1, k2, p1, p2, k3].
    """
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    x = (points[..., 0] - cx) / fx
    y = (points[..., 1] - cy) / fy
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
    x_d = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    y_d = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([x_d * fx + cx, y_d * fy + cy], axis=-1)


def undistort_points(
    points: jax.Array, intrinsics: jax.Array, dist: jax.Array, iters: int = 5
) -> jax.Array:
    """Invert Brown-Conrady distortion via fixed-point iteration (the cv2
    ``undistortPoints`` approach), jittable."""
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]
    xd = (points[..., 0] - cx) / fx
    yd = (points[..., 1] - cy) / fy
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1 + k1 * r2 + k2 * r2**2 + k3 * r2**3
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return jnp.stack([x * fx + cx, y * fy + cy], axis=-1)


def project_camera_pairs_to_3d(
    points: jax.Array,
    intrinsics: jax.Array,
    extrinsics: jax.Array,
    dist: jax.Array,
) -> jax.Array:
    """Triangulate every camera pair (reference cameras.py:22-84).

    Args:
        points: (batch, views, keypoints, 2) pixel coords (distorted).
        intrinsics: (batch, views, 3, 3).
        extrinsics: (batch, views, 3, 4).
        dist: (batch, views, 5).

    Returns:
        (batch, num_pairs, keypoints, 3) 3D points; NaN inputs propagate.
    """
    b, v, k, _ = points.shape
    pairs = list(itertools.combinations(range(v), 2))

    def one_sample(pts, intr, extr, dst):
        proj = _projection_matrices(intr, extr)  # (V, 3, 4)
        outs = []
        for (i, j) in pairs:
            pts_i = undistort_points(pts[i], intr[i], dst[i])
            pts_j = undistort_points(pts[j], intr[j], dst[j])
            outs.append(triangulate_pair(proj[i], proj[j], pts_i, pts_j))
        return jnp.stack(outs, axis=0)  # (pairs, K, 3)

    return jax.vmap(one_sample)(points, intrinsics, extrinsics, dist)


def project_3d_to_2d(
    points_3d: jax.Array,
    intrinsics: jax.Array,
    extrinsics: jax.Array,
    dist: jax.Array,
) -> jax.Array:
    """Project world points into each camera with distortion
    (reference cameras.py:86-171).

    Args:
        points_3d: (batch, keypoints, 3).
        intrinsics: (batch, views, 3, 3).
        extrinsics: (batch, views, 3, 4).
        dist: (batch, views, 5).

    Returns:
        (batch, views, keypoints, 2) pixel coords.
    """

    def one(pts3d, intr, extr, dst):
        def per_view(intr_v, extr_v, dst_v):
            homog = jnp.concatenate(
                [pts3d, jnp.ones_like(pts3d[..., :1])], axis=-1
            )  # (K, 4)
            cam = homog @ extr_v.T  # (K, 3)
            xy = cam[..., :2] / (cam[..., 2:3] + 1e-12)
            fx, fy = intr_v[0, 0], intr_v[1, 1]
            cx, cy = intr_v[0, 2], intr_v[1, 2]
            pix = jnp.stack([xy[..., 0] * fx + cx, xy[..., 1] * fy + cy], axis=-1)
            return distort_points(pix, intr_v, dst_v)

        return jax.vmap(per_view)(intr, extr, dst)

    return jax.vmap(one)(points_3d, intrinsics, extrinsics, dist)


class CameraGroup:
    """Convenience bundle of per-view camera parameters
    (reference cameras.py:174 extends aniposelib's CameraGroup).

    Holds (V, 3, 3) intrinsics, (V, 3, 4) extrinsics, (V, 5) distortions
    and exposes the fast host triangulation plus differentiable
    projection helpers bound to these cameras.
    """

    def __init__(
        self, intrinsics: np.ndarray, extrinsics: np.ndarray, distortions: np.ndarray
    ) -> None:
        self.intrinsics = np.asarray(intrinsics, dtype=np.float32)
        self.extrinsics = np.asarray(extrinsics, dtype=np.float32)
        self.distortions = np.asarray(distortions, dtype=np.float32)
        assert self.intrinsics.shape[1:] == (3, 3)
        assert self.extrinsics.shape[1:] == (3, 4)
        assert self.distortions.shape[1:] == (5,)

    @property
    def num_views(self) -> int:
        return self.intrinsics.shape[0]

    @classmethod
    def from_dict(cls, params: dict) -> "CameraGroup":
        return cls(params["intrinsics"], params["extrinsics"], params["distortions"])

    def triangulate_fast(self, points: np.ndarray) -> np.ndarray:
        """(frames, views, keypoints, 2) -> (frames, keypoints, 3) via
        nanmedian over camera pairs (reference cameras.py:177)."""
        return triangulate_fast(
            points, self.intrinsics, self.extrinsics, self.distortions
        )

    def triangulate_pairs(self, points: jax.Array) -> jax.Array:
        """Differentiable pairwise triangulation bound to these cameras."""
        b = points.shape[0]
        return project_camera_pairs_to_3d(
            points,
            jnp.broadcast_to(jnp.asarray(self.intrinsics), (b, self.num_views, 3, 3)),
            jnp.broadcast_to(jnp.asarray(self.extrinsics), (b, self.num_views, 3, 4)),
            jnp.broadcast_to(jnp.asarray(self.distortions), (b, self.num_views, 5)),
        )

    def project(self, points_3d: jax.Array) -> jax.Array:
        """Differentiable 3D -> 2D projection bound to these cameras."""
        b = points_3d.shape[0]
        return project_3d_to_2d(
            points_3d,
            jnp.broadcast_to(jnp.asarray(self.intrinsics), (b, self.num_views, 3, 3)),
            jnp.broadcast_to(jnp.asarray(self.extrinsics), (b, self.num_views, 3, 4)),
            jnp.broadcast_to(jnp.asarray(self.distortions), (b, self.num_views, 5)),
        )


def triangulate_fast(
    points: np.ndarray,
    intrinsics: np.ndarray,
    extrinsics: np.ndarray,
    dist: np.ndarray,
) -> np.ndarray:
    """Host-side fast triangulation: nanmedian over all camera pairs
    (reference cameras.py:174-244 ``CameraGroup.triangulate_fast``).

    Args:
        points: (frames, views, keypoints, 2).
        intrinsics/extrinsics/dist: (views, 3, 3) / (views, 3, 4) / (views, 5).

    Returns:
        (frames, keypoints, 3) numpy array.
    """
    f, v, k, _ = points.shape
    intr_b = np.broadcast_to(intrinsics, (f, v, 3, 3))
    extr_b = np.broadcast_to(extrinsics, (f, v, 3, 4))
    dist_b = np.broadcast_to(dist, (f, v, 5))
    pts3d = np.asarray(
        project_camera_pairs_to_3d(
            jnp.asarray(points), jnp.asarray(intr_b), jnp.asarray(extr_b),
            jnp.asarray(dist_b),
        )
    )  # (frames, pairs, K, 3)
    return np.nanmedian(pts3d, axis=1)
