"""Soft-argmax decode: the hot per-frame transform, fused for XLA.

Reimplements the reference decode pipeline (reference
lightning_pose/models/heads/heatmap.py:86-144): upsample the predicted
heatmap 2x per downsample level (bicubic + 5x5 pyramid-Gaussian smoothing),
sharpen with a temperature-1000 spatial softmax, take the spatial
expectation, pool confidence in a 2-sigma window around the peak, and
correct the constant grid offset (-0.5 / -1.5 / -2.5 for downsample factor
1/2/3, reference heatmap.py:131-136).

Everything here is shape-static and jit-fused into one XLA computation —
on TPU the whole decode is a handful of fused HLO ops (resize = two
matmuls on the MXU, blur = depthwise conv, softmax/expectation = VPU),
whereas the reference runs it as a chain of kornia kernels.

Heatmaps are channels-last ``(batch, height, width, keypoints)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lightning_pose_tpu.data.heatmaps import evaluate_heatmaps_at_location

__all__ = [
    "spatial_softmax2d",
    "spatial_expectation2d",
    "upsample2x",
    "run_subpixelmaxima",
]


def spatial_softmax2d(heatmaps: jax.Array, temperature: float = 1.0) -> jax.Array:
    """Softmax over the spatial dims per keypoint (kornia
    ``spatial_softmax2d`` semantics, reference heads/heatmap.py:126).

    Args: ``(B, H, W, K)``; returns same shape, each map summing to 1.
    """
    b, h, w, k = heatmaps.shape
    flat = heatmaps.reshape(b, h * w, k) * temperature
    flat = jax.nn.softmax(flat, axis=1)
    return flat.reshape(b, h, w, k)


def spatial_expectation2d(heatmaps: jax.Array) -> jax.Array:
    """Expected (x, y) pixel coordinates per keypoint (kornia
    ``spatial_expectation2d`` with ``normalized_coordinates=False``).

    Args: ``(B, H, W, K)`` normalized maps; returns ``(B, K, 2)``.
    """
    h, w = heatmaps.shape[1], heatmaps.shape[2]
    xs = jnp.arange(w, dtype=heatmaps.dtype)
    ys = jnp.arange(h, dtype=heatmaps.dtype)
    exp_x = jnp.einsum("bhwk,w->bk", heatmaps, xs)
    exp_y = jnp.einsum("bhwk,h->bk", heatmaps, ys)
    return jnp.stack([exp_x, exp_y], axis=-1)


def _pyramid_gaussian_kernel() -> np.ndarray:
    """kornia's 5x5 pyramid kernel ([1,4,6,4,1] outer product / 256)."""
    k1 = np.array([1.0, 4.0, 6.0, 4.0, 1.0])
    return np.outer(k1, k1) / 256.0


def upsample2x(heatmaps: jax.Array) -> jax.Array:
    """2x bicubic upsample + pyramid-Gaussian smoothing
    (reference heads/heatmap.py:86-100, ``align_corners=False``).

    Args/returns: ``(B, H, W, K)`` -> ``(B, 2H, 2W, K)``.
    """
    b, h, w, k = heatmaps.shape
    up = jax.image.resize(heatmaps, (b, 2 * h, 2 * w, k), method="bicubic")
    kernel = jnp.asarray(
        _pyramid_gaussian_kernel(), dtype=heatmaps.dtype
    )[:, :, None, None]
    kernel = jnp.tile(kernel, (1, 1, 1, k))  # (5, 5, 1, K) depthwise
    return jax.lax.conv_general_dilated(
        up,
        kernel,
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),  # zero padding = kornia border_type "constant"
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=k,
    )


def run_subpixelmaxima(
    heatmaps: jax.Array,
    downsample_factor: int = 2,
    temperature: float = 1000.0,
    prefer_pallas: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Soft-argmax decode (reference heads/heatmap.py:103-144).

    Args:
        heatmaps: ``(B, H, W, K)`` normalized heatmaps from the head.
        downsample_factor: number of 2x upsampling rounds to full resolution.
        temperature: softmax sharpening temperature.
        prefer_pallas: on TPU, use the fused Pallas kernel (inference only —
            the Pallas path defines no VJP; see ops/pallas_decode.py).

    Returns:
        tuple of
            - keypoints ``(B, 2K)`` flat (x, y) in full-image pixels,
            - confidences ``(B, K)``.
    """
    import os

    if (
        prefer_pallas
        and heatmaps.shape[1] == heatmaps.shape[2]
        and jax.default_backend() == "tpu"
        and os.environ.get("LP_TPU_PALLAS_DECODE", "1") != "0"
    ):
        from lightning_pose_tpu.ops.pallas_decode import run_subpixelmaxima_pallas

        return run_subpixelmaxima_pallas(
            heatmaps, downsample_factor=downsample_factor, temperature=temperature
        )

    if downsample_factor > 0:
        # the whole upsample pipeline (bicubic 2x + pyramid blur per level)
        # is one separable linear operator: up = M_h @ hm @ M_w^T — two MXU
        # matmuls instead of resize+conv chains (same math as the Pallas
        # kernel; see ops/pallas_decode.upsample_matrix). Rectangular
        # heatmaps get independent per-axis matrices.
        from lightning_pose_tpu.ops.pallas_decode import upsample_matrix

        mh = jnp.asarray(upsample_matrix(heatmaps.shape[1], downsample_factor))
        mw = (
            mh
            if heatmaps.shape[1] == heatmaps.shape[2]
            else jnp.asarray(upsample_matrix(heatmaps.shape[2], downsample_factor))
        )
        heatmaps = jnp.einsum(
            "ph,bhwk,qw->bpqk", mh, heatmaps.astype(jnp.float32), mw
        )
    softmaxes = spatial_softmax2d(heatmaps, temperature=temperature)
    preds = spatial_expectation2d(softmaxes)  # (B, K, 2)
    confidences = evaluate_heatmaps_at_location(softmaxes, preds)
    # grid-offset correction from repeated align_corners=False upsampling
    offset = {0: 0.0, 1: 0.5, 2: 1.5, 3: 2.5}[downsample_factor]
    preds = preds - offset
    b, k = preds.shape[0], preds.shape[1]
    return preds.reshape(b, 2 * k), confidences
