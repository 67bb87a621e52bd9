"""Heatmap tracker: backbone + deconv head, single-frame.

The TPU counterpart of the reference's ``HeatmapTracker`` LightningModule
(reference lightning_pose/models/heatmap_tracker.py:30-200), re-designed as
a pure Flax module: the training loop, loss computation, and decode live in
functional code (``train/``) rather than on the model object. Semi-
supervised behavior is a property of the training step, not a separate
model class.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from lightning_pose_tpu.models.backbones.factory import build_backbone
from lightning_pose_tpu.models.heads.heatmap import HeatmapHead
from lightning_pose_tpu.ops.softargmax import run_subpixelmaxima

__all__ = ["HeatmapTracker"]


class HeatmapTracker(nn.Module):
    """images (B, H, W, 3) normalized -> heatmaps (B, H/2^df, W/2^df, K)."""

    backbone_arch: str = "resnet50"
    num_keypoints: int = 17
    downsample_factor: int = 2
    deconv_out_channels: int | None = None
    image_size: int = 256
    dtype: Any = jnp.bfloat16

    def setup(self) -> None:
        backbone, num_features, _ = build_backbone(
            self.backbone_arch,
            model_type="heatmap",
            image_size=self.image_size,
            dtype=self.dtype,
        )
        self.backbone = backbone
        self.num_features = num_features
        self.head = HeatmapHead(
            backbone_arch=self.backbone_arch,
            out_channels=self.num_keypoints,
            deconv_out_channels=self.deconv_out_channels,
            downsample_factor=self.downsample_factor,
            dtype=self.dtype,
        )

    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        """``(B, H, W, 3)`` frames, or ``(B, V, H, W, 3)`` multiview frames —
        views fold into the batch and unfold into view-major heatmap
        channels (reference models/base.py:296-343 view stacking)."""
        if images.ndim == 5:
            from lightning_pose_tpu.models.heatmap_tracker_mhcrnn import (
                _unfold_view_channels,
            )

            b, v = images.shape[0], images.shape[1]
            flat = images.reshape(b * v, *images.shape[2:])
            return _unfold_view_channels(self(flat, train=train), b, v)
        features = self.backbone(images, train=train)
        return self.head(features)

    def decode(
        self, heatmaps: jax.Array, fast: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        """Soft-argmax decode to ((B, 2K) keypoints, (B, K) confidences)."""
        return run_subpixelmaxima(
            heatmaps,
            downsample_factor=self.downsample_factor,
            temperature=1000.0,
            prefer_pallas=fast,
        )
