"""EfficientNet B0-B2 backbones in Flax — NHWC, stride-32 feature maps.

Covers the reference's efficientnet_b0/b1/b2 options (reference
lightning_pose/models/backbones/factory.py:63-65,302-316). Architecture
follows the standard EfficientNet recipe (MBConv + squeeze-excite, SiLU,
compound width/depth scaling) so that torchvision checkpoints can be ported
later; implementation is TPU-idiomatic NHWC.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["EfficientNet", "EFFICIENTNET_CONFIGS"]

# variant -> (width_mult, depth_mult, num_output_features)
EFFICIENTNET_CONFIGS: dict[str, tuple[float, float, int]] = {
    "b0": (1.0, 1.0, 1280),
    "b1": (1.0, 1.1, 1280),
    "b2": (1.1, 1.2, 1408),
}

# (expand_ratio, channels, num_layers, stride, kernel)
_BASE_STAGES = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


def _round_channels(c: float, divisor: int = 8) -> int:
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


def _round_repeats(r: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * r))


class SqueezeExcite(nn.Module):
    se_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.se_channels, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    out_channels: int
    expand_ratio: int
    stride: int
    kernel: int
    se_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        def bn(name: str):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )

        in_channels = x.shape[-1]
        mid = in_channels * self.expand_ratio
        residual = x
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="expand_conv")(y)
            y = bn("expand_bn")(y)
            y = nn.silu(y)
        # depthwise
        y = nn.Conv(
            mid, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=self.kernel // 2, feature_group_count=mid,
            use_bias=False, dtype=self.dtype, name="dw_conv",
        )(y)
        y = bn("dw_bn")(y)
        y = nn.silu(y)
        y = SqueezeExcite(self.se_channels, dtype=self.dtype, name="se")(y)
        y = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
            name="project_conv",
        )(y)
        y = bn("project_bn")(y)
        if self.stride == 1 and in_channels == self.out_channels:
            y = y + residual
        return y


class EfficientNet(nn.Module):
    """Truncated EfficientNet feature extractor.

    Input ``(B, H, W, 3)`` -> output ``(B, H/32, W/32, C)``; with
    ``global_pool=True``, ``(B, C)``.
    """

    variant: str = "b0"
    dtype: Any = jnp.float32
    global_pool: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width_mult, depth_mult, head_channels = EFFICIENTNET_CONFIGS[self.variant]

        def bn(name: str):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )

        x = x.astype(self.dtype)
        stem = _round_channels(32 * width_mult)
        x = nn.Conv(
            stem, (3, 3), strides=(2, 2), padding=1, use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )(x)
        x = bn("stem_bn")(x)
        x = nn.silu(x)

        for stage, (expand, channels, layers, stride, kernel) in enumerate(_BASE_STAGES):
            out_c = _round_channels(channels * width_mult)
            repeats = _round_repeats(layers, depth_mult)
            for i in range(repeats):
                in_c = x.shape[-1]
                x = MBConv(
                    out_channels=out_c,
                    expand_ratio=expand,
                    stride=stride if i == 0 else 1,
                    kernel=kernel,
                    se_channels=max(1, in_c // 4),
                    dtype=self.dtype,
                    name=f"stage{stage + 1}_{i}",
                )(x, train=train)

        x = nn.Conv(
            head_channels, (1, 1), use_bias=False, dtype=self.dtype, name="head_conv"
        )(x)
        x = bn("head_bn")(x)
        x = nn.silu(x)

        if self.global_pool:
            x = jnp.mean(x, axis=(1, 2))
        return x
