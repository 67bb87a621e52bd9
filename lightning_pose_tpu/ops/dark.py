"""DARK decode: distribution-aware sub-pixel keypoint decoding.

Implements the decoder from "Distribution-Aware Coordinate Representation
for Human Pose Estimation" (Zhang et al., arXiv:1910.06278): Gaussian
modulation of the predicted heatmap, then a second-order Taylor expansion
of the log-likelihood around the argmax —

    offset = -H(m)^{-1} grad(m),   coords = m + offset

This decodes sub-pixel positions directly at HEATMAP resolution, skipping
the reference pipeline's 2x-per-level upsampling entirely: fewer FLOPs
and (for well-formed unimodal heatmaps) lower quantization error than
soft-argmax over upsampled maps. Exposed as the opt-in
``cfg.eval.decode_method: dark`` (default remains the reference-parity
soft-argmax, ops/softargmax.py).

All math is shape-static jnp (argmax + 3x3 gathers + a closed-form 2x2
solve), one fused XLA program on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lightning_pose_tpu.data.heatmaps import evaluate_heatmaps_at_location

__all__ = ["run_dark_decode"]

_EPS = 1e-10


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _modulate(heatmaps: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian modulation (DARK sec. 3.2); per-map max preserved
    so the distribution shape, not the scale, changes."""
    radius = max(1, int(round(3 * sigma)))
    k = jnp.asarray(_gaussian_kernel1d(sigma, radius))
    b, h, w, c = heatmaps.shape
    x = heatmaps
    orig_max = jnp.max(x, axis=(1, 2), keepdims=True)
    kh = k[:, None, None, None] * jnp.ones((1, 1, 1, c), x.dtype)
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), ((radius, radius), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    kw = k[None, :, None, None] * jnp.ones((1, 1, 1, c), x.dtype)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), ((0, 0), (radius, radius)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    new_max = jnp.max(x, axis=(1, 2), keepdims=True)
    return x * orig_max / jnp.maximum(new_max, _EPS)


def run_dark_decode(
    heatmaps: jax.Array,
    downsample_factor: int = 2,
    sigma: float = 1.25,
) -> tuple[jax.Array, jax.Array]:
    """Decode ``(B, H, W, K)`` heatmaps to ``((B, 2K) keypoints, (B, K)
    confidences)`` in full-image pixels.

    ``sigma`` should match the training-target Gaussian width
    (data/heatmaps.py uses 1.25).
    """
    heatmaps = heatmaps.astype(jnp.float32)
    b, h, w, k = heatmaps.shape

    hm = _modulate(jnp.maximum(heatmaps, 0.0), sigma)
    # normalize per map so the confidence window sums are comparable to
    # the soft-argmax path's softmax mass
    total = jnp.sum(hm, axis=(1, 2), keepdims=True)
    hm_norm = hm / jnp.maximum(total, _EPS)

    log_hm = jnp.log(jnp.maximum(hm, _EPS))  # (B, H, W, K)
    l2 = log_hm.transpose(0, 3, 1, 2)  # (B, K, H, W)

    flat = hm.transpose(0, 3, 1, 2).reshape(b, k, h * w)
    peak = jnp.argmax(flat, axis=-1)  # (B, K)
    py = peak // w
    px = peak % w

    offsets = jnp.array([-1, 0, 1], dtype=py.dtype)
    ys = jnp.clip(py[..., None] + offsets, 1, h - 2)  # keep the stencil interior
    xs = jnp.clip(px[..., None] + offsets, 1, w - 2)
    bi = jnp.arange(b)[:, None, None, None]
    ki = jnp.arange(k)[None, :, None, None]
    patch = l2[bi, ki, ys[..., :, None], xs[..., None, :]]  # (B, K, 3, 3)

    dx = 0.5 * (patch[..., 1, 2] - patch[..., 1, 0])
    dy = 0.5 * (patch[..., 2, 1] - patch[..., 0, 1])
    dxx = patch[..., 1, 2] - 2.0 * patch[..., 1, 1] + patch[..., 1, 0]
    dyy = patch[..., 2, 1] - 2.0 * patch[..., 1, 1] + patch[..., 0, 1]
    dxy = 0.25 * (
        patch[..., 2, 2] - patch[..., 2, 0] - patch[..., 0, 2] + patch[..., 0, 0]
    )

    det = dxx * dyy - dxy * dxy
    # Taylor offset only applies when the 3x3 stencil is centered on the
    # true peak; at border peaks (stencil clamped inward) keep the raw
    # argmax coordinate with zero offset, matching the reference
    # DARK/mmpose decoders.
    interior = (py >= 1) & (py <= h - 2) & (px >= 1) & (px <= w - 2)
    safe = (jnp.abs(det) > _EPS) & interior
    det = jnp.where(safe, det, 1.0)
    # -H^{-1} grad, closed form for the 2x2 Hessian
    off_x = -(dyy * dx - dxy * dy) / det
    off_y = -(dxx * dy - dxy * dx) / det
    off_x = jnp.where(safe, jnp.clip(off_x, -1.0, 1.0), 0.0)
    off_y = jnp.where(safe, jnp.clip(off_y, -1.0, 1.0), 0.0)

    cy = py.astype(jnp.float32)
    cx = px.astype(jnp.float32)
    coords_hm = jnp.stack([cx + off_x, cy + off_y], axis=-1)  # (B, K, 2)

    # confidence: normalized-map mass in the window around the peak (the
    # soft-argmax path's 2-sigma-window analog at heatmap resolution)
    confidences = evaluate_heatmaps_at_location(hm_norm, coords_hm)

    scale = float(2**downsample_factor)
    preds = coords_hm * scale
    return preds.reshape(b, 2 * k), confidences
