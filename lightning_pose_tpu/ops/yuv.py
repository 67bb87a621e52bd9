"""On-device I420 (YUV 4:2:0) -> normalized RGB conversion.

Video inference can move frames host->device as planar 4:2:0 YUV — half
the bytes of RGB (1.5 vs 3 per pixel). This mirrors the reference's DALI
architecture, which ships the *compressed* video stream to the GPU and
decodes there (reference lightning_pose/data/dali.py:70-124): the
bandwidth-limited host->accelerator link carries the video's native
subsampled-chroma representation, and the full-resolution RGB tensor only
ever exists in accelerator memory. H.264/H.265 sources are already 4:2:0,
so the chroma information discarded here never existed in the source.

Conversion uses ITU-R BT.601 video-range coefficients (Y in [16, 235]),
matching OpenCV's ``COLOR_YUV2RGB_I420`` on the host (parity-tested
against cv2 in tests/ops/test_yuv.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lightning_pose_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

__all__ = ["i420_to_rgb", "i420_to_normalized_rgb"]


def i420_to_rgb(yuv: jax.Array) -> jax.Array:
    """Planar I420 batches ``(B, H*3/2, W)`` uint8 -> ``(B, H, W, 3)``
    float32 RGB in [0, 255].

    I420 layout per image: H rows of Y, then H/4 rows holding the
    (H/2, W/2) U plane, then H/4 rows holding the V plane.
    """
    b, h32, w = yuv.shape
    h = (h32 * 2) // 3
    y = yuv[:, :h, :].astype(jnp.float32)
    u = yuv[:, h:h + h // 4, :].reshape(b, h // 2, w // 2).astype(jnp.float32)
    v = yuv[:, h + h // 4:, :].reshape(b, h // 2, w // 2).astype(jnp.float32)
    # nearest-neighbor chroma upsample (matches cv2's I420 handling)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)

    # ITU-R BT.601 video range (Y 16-235, chroma 16-240)
    yp = 1.1643836 * (y - 16.0)
    up = u - 128.0
    vp = v - 128.0
    r = yp + 1.5960268 * vp
    g = yp - 0.3917623 * up - 0.8129676 * vp
    bl = yp + 2.0172321 * up
    rgb = jnp.stack([r, g, bl], axis=-1)
    return jnp.clip(rgb, 0.0, 255.0)


def i420_to_normalized_rgb(yuv: jax.Array, out_dtype=None) -> jax.Array:
    """I420 batches -> ImageNet-normalized RGB in one fused device pass
    (the YUV-input analog of ``normalize_images_fused``)."""
    if out_dtype is None:
        out_dtype = jnp.float32
    rgb = i420_to_rgb(yuv) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    return ((rgb - mean) / std).astype(out_dtype)
