"""Backbone networks (Flax, NHWC)."""

from lightning_pose_tpu.models.backbones.factory import (
    ALLOWED_BACKBONES,
    BACKBONE_STRIDES,
    build_backbone,
)

__all__ = ["ALLOWED_BACKBONES", "BACKBONE_STRIDES", "build_backbone"]
