"""Vision Transformer backbones in Flax — NHWC in, token grid out.

Covers the reference's ViT family (reference
lightning_pose/models/backbones/vit.py, vit_dino.py): DINO/DINOv2/DINOv3
ViT-S/B, MAE/ImageNet ViT-B, SAM ViT-B. The wrapper drops CLS/register
tokens and reshapes the token grid to an ``(B, H/16, W/16, D)`` feature map
(reference vit.py:16-50), which downstream heatmap heads consume exactly
like a convnet feature map.

The encoder is split into ``embed`` / ``encode_tokens`` stages so the
multiview transformer can inject per-view embeddings and concatenate views
into one token sequence before attention (reference
heatmap_tracker_multiview.py:139-219).

TPU notes: token count for 256px inputs is 16x16=256 — a single MXU-friendly
attention; bfloat16 compute with fp32 params; position embeddings are
bicubic-resized when the input grid differs from the pretrained grid
(reference vit_dino.py:121-146 does the same for patch-14 -> 16 porting).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ViT", "VIT_CONFIGS"]

# name -> (embed_dim, depth, num_heads, patch_size)
VIT_CONFIGS: dict[str, tuple[int, int, int, int]] = {
    "vits": (384, 12, 6, 16),
    "vitb": (768, 12, 12, 16),
    "vitt": (192, 12, 3, 16),
}


class MlpBlock(nn.Module):
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(d, dtype=self.dtype, name="fc2")(x)
        return x


class EncoderBlock(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="ln1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="attn",
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="ln2")(x)
        y = MlpBlock(mlp_dim=4 * d, dtype=self.dtype, name="mlp")(y)
        return x + y


class ViT(nn.Module):
    """Plain pre-LN ViT encoder returning a spatial feature map.

    Input ``(B, H, W, 3)`` -> output ``(B, H/patch, W/patch, embed_dim)``.
    """

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 16
    pretrained_grid: int = 14  # pos-embed grid side at pretrain time (224/16)
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.patch_embed = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )
        self.cls_token = self.param(
            "cls_token",
            nn.initializers.normal(stddev=0.02),
            (1, 1, self.embed_dim),
            jnp.float32,
        )
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, self.pretrained_grid**2 + 1, self.embed_dim),
            jnp.float32,
        )
        self.blocks = [
            EncoderBlock(num_heads=self.num_heads, dtype=self.dtype, name=f"block{i}")
            for i in range(self.depth)
        ]
        self.ln = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="ln")

    # -- stages -------------------------------------------------------------------

    def embed(self, x: jax.Array) -> tuple[jax.Array, tuple[int, int]]:
        """Patch-embed + grid position embeddings, NO cls token.

        Returns ((B, gh*gw, D) tokens, (gh, gw)).
        """
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        tokens = self.patch_embed(x.astype(self.dtype)).reshape(
            b, gh * gw, self.embed_dim
        )
        pos = _resize_pos_embed(self.pos_embed, self.pretrained_grid, (gh, gw))
        tokens = tokens + pos[:, 1:].astype(self.dtype)
        return tokens, (gh, gw)

    def encode_tokens(
        self, tokens: jax.Array, grid: tuple[int, int] | None = None,
        num_views: int = 1,
    ) -> jax.Array:
        """Run the transformer blocks + final layernorm over any token
        sequence (used by the multiview model on view-concatenated tokens).
        ``grid``/``num_views`` are accepted for interface parity with the
        DINOv2/v3 backbones (unused — position info was added in embed)."""
        for block in self.blocks:
            tokens = block(tokens)
        return self.ln(tokens)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b = x.shape[0]
        tokens, (gh, gw) = self.embed(x)
        pos = _resize_pos_embed(self.pos_embed, self.pretrained_grid, (gh, gw))
        cls = self.cls_token.astype(self.dtype) + pos[:, :1].astype(self.dtype)
        tokens = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), tokens], axis=1)
        tokens = self.encode_tokens(tokens)
        # drop CLS token, reshape token grid to NHWC feature map
        # (reference vit.py:16-50)
        return tokens[:, 1:, :].reshape(b, gh, gw, self.embed_dim)


def _resize_pos_embed(
    pos: jax.Array, pretrained_grid: int, grid: tuple[int, int]
) -> jax.Array:
    """Bicubic-resize the spatial part of the position embedding to ``grid``
    (torch-exact kernel — matches HF ``interpolate_pos_encoding`` and the
    reference vit_dino.py:121-146 interpolation semantics)."""
    from lightning_pose_tpu.ops.interpolate import bicubic_resize_2d

    gh, gw = grid
    if (pretrained_grid, pretrained_grid) == (gh, gw):
        return pos
    cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
    grid_pos = grid_pos.reshape(1, pretrained_grid, pretrained_grid, -1)
    grid_pos = bicubic_resize_2d(grid_pos, (gh, gw), align_corners=False)
    grid_pos = grid_pos.reshape(1, gh * gw, -1)
    return jnp.concatenate([cls_pos, grid_pos], axis=1)
