"""Regression tracker: backbone + linear head -> direct (x, y) coordinates
(reference lightning_pose/models/regression_tracker.py:21-213)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from lightning_pose_tpu.models.backbones.factory import build_backbone
from lightning_pose_tpu.models.heads.regression import LinearRegressionHead

__all__ = ["RegressionTracker"]


class RegressionTracker(nn.Module):
    """images (B, H, W, 3) -> keypoints (B, 2K)."""

    backbone_arch: str = "resnet50"
    num_keypoints: int = 17
    image_size: int = 256
    dtype: Any = jnp.bfloat16

    def setup(self) -> None:
        if self.backbone_arch.startswith("vit"):
            # reference regression_tracker.py:56-57: no ViT support
            raise NotImplementedError(
                "regression models do not support ViT backbones"
            )
        backbone, num_features, _ = build_backbone(
            self.backbone_arch,
            model_type="regression",
            image_size=self.image_size,
            dtype=self.dtype,
        )
        self.backbone = backbone
        self.head = LinearRegressionHead(
            num_targets=2 * self.num_keypoints, dtype=self.dtype
        )

    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        features = self.backbone(images, train=train)
        return self.head(features)
