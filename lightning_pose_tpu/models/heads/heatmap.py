"""Heatmap head: PixelShuffle + transposed-conv upsampling + spatial softmax.

Mirrors the reference head structure (reference
lightning_pose/models/heads/heatmap.py:20-212): a PixelShuffle(2) followed
by ``n_layers = log2(stride) - downsample_factor - 1`` ConvTranspose(3x3,
stride 2) layers, ending in a temperature-1 spatial softmax. Weights are
Xavier-uniform with gain 0.01 and zero bias (reference heatmap.py:74-83).

TPU design: NHWC throughout; PixelShuffle is a reshape/transpose (free under
XLA); transposed convs hit the MXU.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from lightning_pose_tpu.models.backbones.factory import BACKBONE_STRIDES
from lightning_pose_tpu.ops.softargmax import run_subpixelmaxima, spatial_softmax2d

__all__ = ["HeatmapHead", "pixel_shuffle"]


def pixel_shuffle(x: jax.Array, upscale: int = 2) -> jax.Array:
    """NHWC PixelShuffle: ``(B, H, W, C)`` -> ``(B, rH, rW, C/r^2)``.

    Channel ordering matches torch ``nn.PixelShuffle`` (channel index
    ``c*r^2 + i*r + j`` feeds spatial offset ``(i, j)``), so ported weights
    stay compatible.
    """
    b, h, w, c = x.shape
    r = upscale
    x = x.reshape(b, h, w, c // (r * r), r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, i, W, j, C')
    return x.reshape(b, h * r, w * r, c // (r * r))


def _xavier_uniform_gain(gain: float):
    def init(key, shape, dtype=jnp.float32):
        # flax ConvTranspose kernel shape: (kh, kw, in, out)
        fan_in = shape[0] * shape[1] * shape[2]
        fan_out = shape[0] * shape[1] * shape[3]
        limit = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


class HeatmapHead(nn.Module):
    """Deconvolution head converting backbone features to per-keypoint
    heatmaps (reference heads/heatmap.py:147)."""

    backbone_arch: str
    out_channels: int  # num keypoints
    deconv_out_channels: int | None = None
    downsample_factor: int = 2
    final_softmax: bool = True
    dtype: Any = jnp.float32

    # soft-argmax temperature (reference heatmap.py:187)
    temperature: float = 1000.0

    @nn.compact
    def __call__(self, features: jax.Array) -> jax.Array:
        """features ``(B, h, w, C)`` -> heatmaps ``(B, H', W', K)``."""
        stride = BACKBONE_STRIDES.get(self.backbone_arch, 32)
        n_layers = int(math.log2(stride)) - self.downsample_factor - 1

        x = pixel_shuffle(features.astype(self.dtype), 2)
        int_channels = self.deconv_out_channels or self.out_channels
        for layer in range(n_layers):
            out = self.out_channels if layer == n_layers - 1 else int_channels
            x = nn.ConvTranspose(
                features=out,
                kernel_size=(3, 3),
                strides=(2, 2),
                padding="SAME",
                kernel_init=_xavier_uniform_gain(0.01),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=f"deconv{layer}",
            )(x)
        x = x.astype(jnp.float32)
        if self.final_softmax:
            x = spatial_softmax2d(x, temperature=1.0)
        return x

    def run_subpixelmaxima(self, heatmaps: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Soft-argmax decode; see :func:`...ops.softargmax.run_subpixelmaxima`."""
        return run_subpixelmaxima(
            heatmaps,
            downsample_factor=self.downsample_factor,
            temperature=self.temperature,
        )
