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
# upsampling layers in the heatmap head. Convnets and the SAM2 Hiera trunk
# (4x patch embed + 3 stages of 2x query pooling) run at stride 32; plain
# 16x16-patch ViTs at stride 16 (reference factory.py:98-124).
BACKBONE_STRIDES: dict[str, int] = {
    **{name: 32 for name in ALLOWED_CONVNET_BACKBONES},
    **{name: 16 for name in ALLOWED_TRANSFORMER_BACKBONES},
    "vitb_sam2": 32,
    "vits_sam2": 32,
    "vitt_sam2": 32,
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
            backbone_arch,
            image_size=image_size,
            dtype=dtype,
            backbone_checkpoint=backbone_checkpoint,
            **kwargs,
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
    else:
        # all resnet50_* pose variants share the resnet50 architecture
        arch = "resnet50" if backbone_arch.startswith("resnet50_") else backbone_arch
        module = ResNet(
            arch=arch, dtype=dtype, global_pool=(model_type == "regression")
        )
        num_features = RESNET_CONFIGS[arch][2]

    pretrained = None
    if backbone_checkpoint and os.path.isfile(backbone_checkpoint):
        from lightning_pose_tpu.models.backbones.torch_port import (
            port_backbone_checkpoint,
        )

        pretrained = port_backbone_checkpoint(backbone_arch, backbone_checkpoint)
        logger.info(f"ported torch checkpoint {backbone_checkpoint} for {backbone_arch}")
    else:
        logger.warning(
            f"no local checkpoint for backbone '{backbone_arch}'; using random "
            "initialization (no network egress to download pretrained weights)"
        )

    return module, num_features, pretrained


def make_transformer_module(backbone_arch: str, image_size: int, dtype: Any):
    """Construct the Flax module for a transformer backbone name.

    Dispatches to the real architecture family (reference
    backbones/factory.py:196-240): plain ViT for dino/imagenet names,
    DINOv2/DINOv3 variants with LayerScale (+RoPE/registers for v3), the
    SAM ViTDet encoder, and the SAM2 Hiera trunk. Returns
    (module, num_output_features).
    """
    if backbone_arch.endswith("_sam2"):
        from lightning_pose_tpu.models.backbones.hiera import (
            HIERA_CONFIGS,
            Hiera,
        )

        module = Hiera(**HIERA_CONFIGS[backbone_arch], dtype=dtype)
        return module, module.out_features

    size_key = backbone_arch.split("_")[0]  # vits / vitb / vitt
    if size_key not in VIT_CONFIGS:
        raise NotImplementedError(f'"{backbone_arch}" transformer not supported yet')
    embed_dim, depth, num_heads, patch = VIT_CONFIGS[size_key]
    grid = image_size // patch

    if backbone_arch == "vitb_sam":
        from lightning_pose_tpu.models.backbones.vit_sam import SamViT

        return SamViT(
            embed_dim=embed_dim, depth=depth, num_heads=num_heads,
            patch_size=patch, pos_grid=grid, dtype=dtype,
        ), embed_dim
    if backbone_arch.endswith("_dinov2"):
        from lightning_pose_tpu.models.backbones.vit_dino import DinoV2ViT

        return DinoV2ViT(
            embed_dim=embed_dim, depth=depth, num_heads=num_heads,
            patch_size=patch, pretrained_grid=grid, dtype=dtype,
        ), embed_dim
    if backbone_arch.endswith("_dinov3"):
        from lightning_pose_tpu.models.backbones.vit_dino import DinoV3ViT

        return DinoV3ViT(
            embed_dim=embed_dim, depth=depth, num_heads=num_heads,
            patch_size=patch, num_register_tokens=4, dtype=dtype,
        ), embed_dim
    # plain HF ViTModel family: facebook/dino-*, facebook/vit-mae-base
    module = ViT(
        embed_dim=embed_dim,
        depth=depth,
        num_heads=num_heads,
        patch_size=patch,
        pretrained_grid=grid,
        dtype=dtype,
    )
    return module, embed_dim


def _build_transformer_backbone(
    backbone_arch: str,
    image_size: int,
    dtype: Any,
    backbone_checkpoint: str | None = None,
    **kwargs: Any,
):
    module, num_features = make_transformer_module(backbone_arch, image_size, dtype)

    pretrained = None
    if backbone_checkpoint and os.path.isfile(str(backbone_checkpoint)):
        from lightning_pose_tpu.models.backbones.torch_port import (
            port_backbone_checkpoint,
        )

        pretrained = port_backbone_checkpoint(
            backbone_arch, str(backbone_checkpoint), image_size=image_size
        )
        logger.info(
            f"ported torch checkpoint {backbone_checkpoint} for {backbone_arch}"
        )
    else:
        logger.warning(
            f"backbone '{backbone_arch}' uses random initialization "
            "(no network egress to download pretrained weights)"
        )
    return module, num_features, pretrained
