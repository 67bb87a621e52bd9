"""Backbone registry and builder.

Single source of truth for backbone identifiers, mirroring the reference's
``ALLOWED_*`` lists and ``BACKBONE_STRIDES`` map (reference
lightning_pose/models/backbones/factory.py:51-124). Builds Flax modules;
pretrained weights are loaded from local checkpoint files when provided
(this environment has no network egress — the reference downloads from
torchvision/MMPose/HF URLs instead, factory.py:238-334).
"""

from __future__ import annotations

import logging
import os
from typing import Any

import jax.numpy as jnp

from lightning_pose_tpu.models.backbones.resnet import RESNET_CONFIGS, ResNet
from lightning_pose_tpu.models.backbones.vit import VIT_CONFIGS, ViT

logger = logging.getLogger(__name__)

__all__ = [
    "ALLOWED_BACKBONES",
    "ALLOWED_CONVNET_BACKBONES",
    "ALLOWED_TRANSFORMER_BACKBONES",
    "ALLOWED_TRANSFORMER_BACKBONES_MULTIVIEW",
    "BACKBONE_STRIDES",
    "build_backbone",
]

ALLOWED_CONVNET_BACKBONES = [
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "resnet50_animal_apose",
    "resnet50_animal_ap10k",
    "resnet50_human_jhmdb",
    "resnet50_human_res_rle",
    "resnet50_human_top_res",
    "resnet50_human_hand",
    "efficientnet_b0",
    "efficientnet_b1",
    "efficientnet_b2",
]

ALLOWED_TRANSFORMER_BACKBONES = [
    "vits_dino",
    "vits_dinov2",
    "vits_dinov3",
    "vitb_dino",
    "vitb_dinov2",
    "vitb_dinov3",
    "vitb_imagenet",
    "vitb_sam",
    "vitb_sam2",
    "vits_sam2",
    "vitt_sam2",
]

ALLOWED_TRANSFORMER_BACKBONES_MULTIVIEW = [
    "vits_dino",
    "vits_dinov2",
    "vits_dinov3",
    "vitb_dino",
    "vitb_dinov2",
    "vitb_dinov3",
    "vitb_imagenet",
]

ALLOWED_BACKBONES = ALLOWED_CONVNET_BACKBONES + ALLOWED_TRANSFORMER_BACKBONES

# feature-map stride (input_size / feature_map_size); drives the number of
# upsampling layers in the heatmap head (reference factory.py:98-124)
# NOTE: the reference's SAM2 Hiera trunk runs at stride 32
# (reference factory.py:121-123); this build substitutes a plain ViT for the
# sam2 names (stride 16), so the stride map reflects OUR architecture to
# keep the head's upsampling-layer count consistent.
BACKBONE_STRIDES: dict[str, int] = {
    **{name: 32 for name in ALLOWED_CONVNET_BACKBONES},
    **{name: 16 for name in ALLOWED_TRANSFORMER_BACKBONES},
}


def build_backbone(
    backbone_arch: str,
    model_type: str = "heatmap",
    image_size: int = 256,
    dtype: Any = jnp.float32,
    backbone_checkpoint: str | None = None,
    **kwargs: Any,
):
    """Build a backbone module by name.

    Returns:
        tuple of (flax module, num output features, optional pretrained
        variables dict with 'params'/'batch_stats' leaves to merge into the
        initialized model state).
    """
    if backbone_arch not in ALLOWED_BACKBONES:
        raise ValueError(
            f'"{backbone_arch}" is not a valid backbone; '
            f"allowed backbones: {sorted(ALLOWED_BACKBONES)}"
        )

    if backbone_arch.startswith("vit"):
        return _build_transformer_backbone(
            backbone_arch, image_size=image_size, dtype=dtype, **kwargs
        )
    return _build_convnet_backbone(
        backbone_arch,
        model_type=model_type,
        dtype=dtype,
        backbone_checkpoint=backbone_checkpoint,
    )


def _build_convnet_backbone(
    backbone_arch: str,
    model_type: str,
    dtype: Any,
    backbone_checkpoint: str | None,
):
    if backbone_arch.startswith("efficientnet"):
        from lightning_pose_tpu.models.backbones.efficientnet import (
            EFFICIENTNET_CONFIGS,
            EfficientNet,
        )

        variant = backbone_arch.split("_")[-1]
        module = EfficientNet(
            variant=variant, dtype=dtype, global_pool=(model_type == "regression")
        )
        num_features = EFFICIENTNET_CONFIGS[variant][-1]
        return module, num_features, None

    # all resnet50_* pose variants share the resnet50 architecture
    arch = "resnet50" if backbone_arch.startswith("resnet50_") else backbone_arch
    module = ResNet(
        arch=arch, dtype=dtype, global_pool=(model_type == "regression")
    )
    num_features = RESNET_CONFIGS[arch][2]

    pretrained = None
    if backbone_checkpoint and os.path.isfile(backbone_checkpoint):
        from lightning_pose_tpu.models.backbones.torch_port import (
            load_torch_checkpoint,
            port_resnet_state_dict,
        )

        stage_sizes, bottleneck, _ = RESNET_CONFIGS[arch]
        state_dict = load_torch_checkpoint(backbone_checkpoint)
        params, batch_stats = port_resnet_state_dict(
            state_dict, tuple(stage_sizes), bottleneck
        )
        pretrained = {"params": params, "batch_stats": batch_stats}
        logger.info(f"ported torch checkpoint {backbone_checkpoint} for {backbone_arch}")
    else:
        logger.warning(
            f"no local checkpoint for backbone '{backbone_arch}'; using random "
            "initialization (no network egress to download pretrained weights)"
        )

    return module, num_features, pretrained


def _build_transformer_backbone(
    backbone_arch: str, image_size: int, dtype: Any, **kwargs: Any
):
    size_key = backbone_arch.split("_")[0]  # vits / vitb / vitt
    if size_key not in VIT_CONFIGS:
        raise NotImplementedError(f'"{backbone_arch}" transformer not supported yet')
    embed_dim, depth, num_heads, patch = VIT_CONFIGS[size_key]
    module = ViT(
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        patch_size=patch,
        pretrained_grid=image_size // patch,
        dtype=dtype,
    )
    logger.warning(
        f"backbone '{backbone_arch}' uses random initialization "
        "(no network egress to download pretrained weights)"
    )
    return module, embed_dim, None
