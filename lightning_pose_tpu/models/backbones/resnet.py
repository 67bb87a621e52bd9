"""ResNet backbones in Flax — NHWC, bfloat16-friendly.

Architecture matches torchvision's ResNet family (so ImageNet / MMPose
checkpoints port over; see ``torch_port.py``) but the implementation is
TPU-idiomatic: NHWC layout, channels in the lane dimension, optional
bfloat16 compute with fp32 parameters and fp32 batch-norm statistics.

The pose models truncate after the final residual stage (stride 32), which
corresponds to the reference's ``children()[:-2]`` truncation for heatmap
models (reference lightning_pose/models/backbones/factory.py:324-348).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ResNet", "RESNET_CONFIGS"]

# (block type, stage sizes, bottleneck?)
RESNET_CONFIGS: dict[str, tuple[Sequence[int], bool, int]] = {
    # name: (blocks per stage, bottleneck, num_features at output)
    "resnet18": ((2, 2, 2, 2), False, 512),
    "resnet34": ((3, 4, 6, 3), False, 512),
    "resnet50": ((3, 4, 6, 3), True, 2048),
    "resnet101": ((3, 4, 23, 3), True, 2048),
    "resnet152": ((3, 8, 36, 3), True, 2048),
}


class BasicBlock(nn.Module):
    """Two 3x3 convs with identity shortcut (resnet18/34)."""

    features: int
    strides: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        norm = _norm(self, train)
        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = norm(name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with 4x expansion (resnet50+)."""

    features: int  # bottleneck width; output channels = 4 * features
    strides: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        norm = _norm(self, train)
        residual = x
        y = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=1, use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(y)
        y = norm(name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


def _norm(module: nn.Module, train: bool) -> Callable[..., Any]:
    """BatchNorm factory: fp32 stats regardless of compute dtype.

    Batch statistics are computed over the (globally sharded) batch; under
    GSPMD this yields cross-replica statistics, subsuming the reference's
    ``sync_batchnorm=True`` (reference train.py:427).
    """

    def make(name: str) -> nn.Module:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=module.dtype,
            param_dtype=jnp.float32,
            name=name,
        )

    return lambda name: make(name)


def max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    """torch MaxPool2d(kernel=3, stride=2, padding=1) equivalent."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class ResNet(nn.Module):
    """Truncated ResNet feature extractor.

    Input ``(B, H, W, 3)`` -> output ``(B, H/32, W/32, C)`` feature maps.
    With ``global_pool=True`` (regression models, reference
    backbones/factory.py:324), output is ``(B, C)``.
    """

    arch: str = "resnet50"
    dtype: Any = jnp.float32
    global_pool: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        stage_sizes, bottleneck, _ = RESNET_CONFIGS[self.arch]
        block_cls = BottleneckBlock if bottleneck else BasicBlock

        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=jnp.float32, name="bn1",
        )(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        for stage, num_blocks in enumerate(stage_sizes):
            width = 64 * (2**stage)
            for block in range(num_blocks):
                strides = 2 if (stage > 0 and block == 0) else 1
                x = block_cls(
                    features=width,
                    strides=strides,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)

        if self.global_pool:
            x = jnp.mean(x, axis=(1, 2))
        return x

    @property
    def num_features(self) -> int:
        return RESNET_CONFIGS[self.arch][2]
