"""Multi-head CRNN head for 5-frame temporal context
(reference lightning_pose/models/heads/heatmap_mhcrnn.py:18-316).

Two heads over per-frame backbone features:
- single-frame: the standard HeatmapHead on the middle frame,
- multi-frame: per-frame PixelShuffle + deconv to heatmap resolution, then a
  bidirectional convolutional RNN (``x_f = W_f(x_t) + H_f(x_prev)``) whose
  forward and backward terminal states are averaged.

The recurrence is a static 5-step unroll (the context length is fixed), so
XLA fuses the whole head; the grouped transposed conv inside the hidden
path is expressed as an input-dilated grouped conv (TPU-friendly, since
``lax.conv_transpose`` lacks grouping).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from lightning_pose_tpu.models.heads.heatmap import (
    HeatmapHead,
    _xavier_uniform_gain,
    pixel_shuffle,
)
from lightning_pose_tpu.ops.softargmax import run_subpixelmaxima, spatial_softmax2d

__all__ = ["HeatmapMHCRNNHead", "UpsamplingCRNN"]


class GroupedConvTranspose2x2(nn.Module):
    """Grouped 2x2 stride-2 transposed conv via input dilation.

    Equivalent to torch ``ConvTranspose2d(k=2, s=2, p=0, groups=G)``:
    output spatial size = 2x input.
    """

    out_channels: int
    groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            _xavier_uniform_gain(1.0),
            (2, 2, in_ch // self.groups, self.out_channels),
            jnp.float32,
        ).astype(self.dtype)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_channels,), jnp.float32
        ).astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        return out + bias


class UpsamplingCRNN(nn.Module):
    """Bidirectional convolutional RNN over context-frame heatmaps
    (reference heatmap_mhcrnn.py:139-316)."""

    num_filters_for_upsampling: int
    num_keypoints: int
    upsampling_factor: int = 2
    nfilters_channel: int = 16
    dtype: Any = jnp.float32

    def setup(self) -> None:
        k = self.num_keypoints
        if self.upsampling_factor == 2:
            self.W_pre = nn.ConvTranspose(
                k, (3, 3), strides=(2, 2), padding="SAME",
                kernel_init=_xavier_uniform_gain(1.0),
                bias_init=nn.initializers.zeros, dtype=self.dtype, name="W_pre",
            )
        self.W_f = nn.ConvTranspose(
            k, (3, 3), strides=(2, 2), padding="SAME",
            kernel_init=_xavier_uniform_gain(1.0),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="W_f",
        )
        self.W_b = nn.ConvTranspose(
            k, (3, 3), strides=(2, 2), padding="SAME",
            kernel_init=_xavier_uniform_gain(1.0),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="W_b",
        )
        self.H_f_conv = nn.Conv(
            k * self.nfilters_channel, (2, 2), strides=(2, 2),
            feature_group_count=k, kernel_init=_xavier_uniform_gain(1.0),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="H_f_conv",
        )
        self.H_f_deconv = GroupedConvTranspose2x2(
            out_channels=k, groups=k, dtype=self.dtype, name="H_f_deconv"
        )
        self.H_b_conv = nn.Conv(
            k * self.nfilters_channel, (2, 2), strides=(2, 2),
            feature_group_count=k, kernel_init=_xavier_uniform_gain(1.0),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="H_b_conv",
        )
        self.H_b_deconv = GroupedConvTranspose2x2(
            out_channels=k, groups=k, dtype=self.dtype, name="H_b_deconv"
        )

    def __call__(self, features: jax.Array) -> jax.Array:
        """features ``(T, B, h, w, C)`` -> heatmaps ``(B, H', W', K)``."""
        t, b, h, w, c = features.shape
        x = features.reshape(t * b, h, w, c).astype(self.dtype)
        x = pixel_shuffle(x, 2)
        if self.upsampling_factor == 2:
            x = self.W_pre(x)
        x = x.reshape(t, b, *x.shape[1:])

        def H_f(v):
            return self.H_f_deconv(self.H_f_conv(v))

        def H_b(v):
            return self.H_b_deconv(self.H_b_conv(v))

        x_f = self.W_f(x[0])
        for i in range(1, t):
            x_f = self.W_f(x[i]) + H_f(x_f)
        x_b = self.W_b(x[t - 1])
        for i in range(t - 2, -1, -1):
            x_b = self.W_b(x[i]) + H_b(x_b)

        heatmaps = ((x_f + x_b) / 2).astype(jnp.float32)
        return spatial_softmax2d(heatmaps, temperature=1.0)


class HeatmapMHCRNNHead(nn.Module):
    """Dual single-frame / multi-frame context head
    (reference heatmap_mhcrnn.py:18-136)."""

    backbone_arch: str
    in_channels: int
    out_channels: int
    deconv_out_channels: int | None = None
    downsample_factor: int = 2
    upsampling_factor: int = 2
    dtype: Any = jnp.float32
    temperature: float = 1000.0

    def setup(self) -> None:
        self.head_sf = HeatmapHead(
            backbone_arch=self.backbone_arch,
            out_channels=self.out_channels,
            deconv_out_channels=self.deconv_out_channels,
            downsample_factor=self.downsample_factor,
            dtype=self.dtype,
            name="head_sf",
        )
        self.head_mf = UpsamplingCRNN(
            num_filters_for_upsampling=self.in_channels,
            num_keypoints=self.out_channels,
            upsampling_factor=self.upsampling_factor,
            dtype=self.dtype,
            name="head_mf",
        )

    def __call__(self, features: jax.Array) -> tuple[jax.Array, jax.Array]:
        """features ``(B, T=5, h, w, C)`` -> (heatmaps_sf, heatmaps_mf),
        each ``(B, H', W', K)``."""
        feats_tb = jnp.moveaxis(features, 1, 0)  # (T, B, h, w, C)
        heatmaps_sf = self.head_sf(feats_tb[2])  # middle frame
        heatmaps_mf = self.head_mf(feats_tb)
        return heatmaps_sf, heatmaps_mf

    def run_subpixelmaxima(self, heatmaps: jax.Array) -> tuple[jax.Array, jax.Array]:
        return run_subpixelmaxima(
            heatmaps,
            downsample_factor=self.downsample_factor,
            temperature=self.temperature,
        )
