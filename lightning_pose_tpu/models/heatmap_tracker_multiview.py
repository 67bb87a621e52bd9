"""Multiview transformer tracker
(reference lightning_pose/models/heatmap_tracker_multiview.py:32-480).

ViT-only model: per-view patch embeddings get a **learnable view embedding**
added, all views concatenate into one token sequence so self-attention is
cross-view, and a shared heatmap head decodes each view's token grid
(reference :139-257). Supervised 3D losses (pairwise triangulation +
reprojection) attach when camera calibration is present.

TPU notes: for V views of 256px/16-patch inputs the fused sequence is
V*256 tokens — still a single MXU-friendly attention; bf16 throughout.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from lightning_pose_tpu.models.backbones.factory import (
    ALLOWED_TRANSFORMER_BACKBONES_MULTIVIEW,
    make_transformer_module,
)
from lightning_pose_tpu.models.heads.heatmap import HeatmapHead
from lightning_pose_tpu.ops.softargmax import run_subpixelmaxima

__all__ = ["HeatmapTrackerMultiviewTransformer"]


class HeatmapTrackerMultiviewTransformer(nn.Module):
    """images (B, V, H, W, 3) -> heatmaps (B, H', W', V*K) (view-major)."""

    backbone_arch: str = "vits_dino"
    num_keypoints: int = 17  # per view
    num_views: int = 2
    downsample_factor: int = 2
    image_size: int = 256
    dtype: Any = jnp.bfloat16

    def setup(self) -> None:
        if self.backbone_arch not in ALLOWED_TRANSFORMER_BACKBONES_MULTIVIEW:
            raise ValueError(
                f'backbone "{self.backbone_arch}" is not supported for multiview '
                f"transformer models; allowed: "
                f"{ALLOWED_TRANSFORMER_BACKBONES_MULTIVIEW}"
            )
        # real family per name: plain ViT (dino/imagenet), DINOv2 with
        # LayerScale, DINOv3 with RoPE — all expose embed/encode_tokens
        self.backbone, embed_dim = make_transformer_module(
            self.backbone_arch, self.image_size, self.dtype
        )
        self.embed_dim = embed_dim
        # learnable per-view embeddings (reference :107-115)
        self.view_embeddings = self.param(
            "view_embeddings",
            nn.initializers.normal(stddev=0.02),
            (self.num_views, embed_dim),
            jnp.float32,
        )
        self.head = HeatmapHead(
            backbone_arch=self.backbone_arch,
            out_channels=self.num_keypoints,
            downsample_factor=self.downsample_factor,
            dtype=self.dtype,
        )

    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        b, v, h, w, c = images.shape
        assert v == self.num_views
        flat = images.reshape(b * v, h, w, c)

        # per-view patch embeddings + view embeddings, then concatenate
        # views into one token sequence (reference forward_vit :139-219)
        tokens, (gh, gw) = self.backbone.embed(flat)  # (B*V, N, D)
        n = tokens.shape[1]
        view_emb = self.view_embeddings.astype(tokens.dtype)  # (V, D)
        view_emb_flat = jnp.tile(view_emb, (b, 1))  # (B*V, D) — index i -> view i%V
        tokens = tokens + view_emb_flat[:, None, :]
        tokens = tokens.reshape(b, v * n, self.embed_dim)

        # cross-view attention (DINOv3 gets per-view RoPE coordinate tables)
        tokens = self.backbone.encode_tokens(tokens, grid=(gh, gw), num_views=v)

        # back to per-view NHWC feature maps for the shared head
        feats = tokens.reshape(b * v, gh, gw, self.embed_dim)
        heatmaps = self.head(feats)  # (B*V, H', W', K)
        hh, ww = heatmaps.shape[1], heatmaps.shape[2]
        heatmaps = heatmaps.reshape(b, v, hh, ww, self.num_keypoints)
        heatmaps = jnp.moveaxis(heatmaps, 1, 3).reshape(b, hh, ww, v * self.num_keypoints)
        return heatmaps

    def decode(
        self, heatmaps: jax.Array, fast: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        """Soft-argmax over all V*K channels -> ((B, 2VK), (B, VK))."""
        return run_subpixelmaxima(
            heatmaps,
            downsample_factor=self.downsample_factor,
            temperature=1000.0,
            prefer_pallas=fast,
        )
