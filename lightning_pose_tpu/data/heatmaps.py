"""Gaussian target heatmap generation and evaluation — jitted, channels-last.

Behavior mirrors the reference (reference lightning_pose/data/heatmaps.py:11-142)
but is designed TPU-first:

- heatmaps are laid out ``(batch, height, width, keypoints)`` (NHWC, K in the
  lane dimension) so the VPU vectorizes across keypoints,
- generation is a fully vectorized jitted function run **on device inside the
  training step** (the reference generates targets per-sample on CPU dataloader
  workers),
- the windowed confidence sum is a 5x5 ``reduce_window`` box filter followed by
  a single gather, instead of the reference's 25-term Python loop.

Visibility semantics (reference heatmaps.py:80-86): 0 -> zero map (ignored in
losses), 1 -> uniform map (encourage low confidence), 2 -> Gaussian; NaN or
out-of-range keypoints always produce a zero map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["generate_heatmaps", "evaluate_heatmaps_at_location"]


def generate_heatmaps(
    keypoints: jax.Array,
    height: int,
    width: int,
    output_shape: tuple[int, int],
    sigma: float = 1.25,
    visibility: jax.Array | None = None,
) -> jax.Array:
    """Generate 2D Gaussian target heatmaps (reference data/heatmaps.py:11).

    Args:
        keypoints: ``(batch, num_keypoints, 2)`` (x, y) in input-image pixels.
        height/width: input image dims (pixels).
        output_shape: (out_height, out_width) of the heatmaps.
        sigma: Gaussian std in heatmap pixels.
        visibility: optional ``(batch, num_keypoints)`` int flags 0/1/2.

    Returns:
        ``(batch, out_height, out_width, num_keypoints)`` float32 heatmaps,
        each normalized to sum to 1 (or all-zero / uniform per visibility).
    """
    out_height, out_width = output_shape
    keypoints = keypoints.astype(jnp.float32)
    x = keypoints[:, :, 0] * (out_width / width)
    y = keypoints[:, :, 1] * (out_height / height)

    nan_idxs = (
        jnp.isnan(x)
        | (x < -1)
        | (x > out_width + 1)
        | (y < -1)
        | (y > out_height + 1)
    )
    # clamp to prevent extreme exponent arguments (NaNs become the clamp bound)
    x = jnp.clip(jnp.nan_to_num(x, nan=-1.0), -1, out_width + 1)
    y = jnp.clip(jnp.nan_to_num(y, nan=-1.0), -1, out_height + 1)

    yy = jnp.arange(out_height, dtype=jnp.float32)[None, :, None, None]  # (1,H,1,1)
    xx = jnp.arange(out_width, dtype=jnp.float32)[None, None, :, None]  # (1,1,W,1)
    mu_x = x[:, None, None, :]  # (B,1,1,K)
    mu_y = y[:, None, None, :]

    log_g = -((yy - mu_y) ** 2 + (xx - mu_x) ** 2) / (2.0 * sigma**2)
    heatmaps = jnp.exp(log_g)  # (B,H,W,K)
    heatmaps = heatmaps / jnp.sum(heatmaps, axis=(1, 2), keepdims=True)

    uniform = jnp.float32(1.0 / (out_height * out_width))
    nan_mask = nan_idxs[:, None, None, :]
    if visibility is None:
        heatmaps = jnp.where(nan_mask, 0.0, heatmaps)
    else:
        vis = visibility[:, None, None, :]
        heatmaps = jnp.where(nan_mask, 0.0, heatmaps)
        heatmaps = jnp.where(vis == 1, uniform, heatmaps)
        heatmaps = jnp.where(vis == 0, 0.0, heatmaps)
    return heatmaps


def evaluate_heatmaps_at_location(
    heatmaps: jax.Array,
    locs: jax.Array,
    sigma: float = 1.25,
    num_stds: int = 2,
) -> jax.Array:
    """Sum heatmap mass in a window around predicted locations
    (reference data/heatmaps.py:90).

    The reference pads by ``floor(sigma * num_stds)`` and sums the
    ``(2p+1)^2`` window around the truncated-int location. Here that is a
    box-filter (``reduce_window`` with zero padding) + one gather per keypoint.

    Args:
        heatmaps: ``(batch, height, width, num_keypoints)``.
        locs: ``(batch, num_keypoints, 2)`` (x, y) predicted locations.

    Returns:
        ``(batch, num_keypoints)`` confidence values.
    """
    pix = int(np.floor(sigma * num_stds))
    window = 2 * pix + 1
    # separable box filter as two depthwise convs (zero padding)
    k = heatmaps.shape[-1]
    ones_h = jnp.ones((window, 1, 1, k), dtype=heatmaps.dtype)
    ones_w = jnp.ones((1, window, 1, k), dtype=heatmaps.dtype)
    summed = jax.lax.conv_general_dilated(
        heatmaps, ones_h, (1, 1), [(pix, pix), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=k,
    )
    summed = jax.lax.conv_general_dilated(
        summed, ones_w, (1, 1), [(0, 0), (pix, pix)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=k,
    )
    b, h, w, _ = heatmaps.shape
    # integer indexing carries no gradient wrt locations (the reference's
    # torch int64 cast likewise); heatmap values keep their gradient
    locs = jax.lax.stop_gradient(locs)
    # truncate-toward-zero like torch .type(torch.int64)
    xi = jnp.clip(locs[:, :, 0].astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(locs[:, :, 1].astype(jnp.int32), 0, h - 1)
    b_idx = jnp.arange(b)[:, None]
    k_idx = jnp.arange(k)[None, :]
    return summed[b_idx, yi, xi, k_idx]
