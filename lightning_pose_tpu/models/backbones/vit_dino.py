"""DINOv2 / DINOv3 Vision Transformer backbones in Flax — NHWC in, token grid out.

Faithful TPU re-implementations of the architectures the reference wraps via
HuggingFace (reference lightning_pose/models/backbones/vit_dino.py):

- **DINOv2** (``Dinov2Model``): pre-LN ViT with LayerScale on both residual
  branches, learned CLS + position embeddings (bicubic-interpolated for
  non-native grids), GELU MLP. The reference normalizes DINOv2's patch-14
  checkpoints to patch 16 by bicubic-resizing the patch-embedding projection
  (reference vit_dino.py:121-146); that happens at weight-port time here
  (torch_port.port_dinov2_state_dict).
- **DINOv3** (``DINOv3ViTModel``): CLS + register tokens, NO learned position
  embeddings — axial RoPE over patch-center coordinates instead — LayerScale,
  separate q/k/v/o projections with no key bias.

Both expose the ``embed`` / ``encode_tokens`` two-stage interface used by the
multiview transformer (view-embedding injection + cross-view token concat).

TPU notes: attention softmax in fp32 (matches HF eager numerics), bfloat16
matmuls elsewhere; RoPE cos/sin are trace-time constants for static shapes.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lightning_pose_tpu.ops.interpolate import bicubic_resize_2d

__all__ = ["DinoV2ViT", "DinoV3ViT", "attention"]


def attention(
    q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int
) -> jax.Array:
    """Plain multi-head attention over (B, N, D) with fp32 softmax.

    Scale is applied to q first, matching HF eager attention.
    """
    b, nq, d = q.shape
    nk = k.shape[1]
    h = num_heads
    hd = d // h
    scale = hd ** -0.5
    q = q.reshape(b, nq, h, hd).transpose(0, 2, 1, 3) * scale
    k = k.reshape(b, nk, h, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, nk, h, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    return out.transpose(0, 2, 1, 3).reshape(b, nq, d)


class LayerScale(nn.Module):
    """Per-channel learned residual-branch scaling (DINOv2/v3 blocks)."""

    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        lam = self.param(
            "lambda", nn.initializers.constant(self.init_value), (self.dim,),
            jnp.float32,
        )
        return x * lam.astype(x.dtype)


class DinoV2Block(nn.Module):
    num_heads: int
    ls_init: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        y = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="ln1"
        )(x)
        q = nn.Dense(d, dtype=self.dtype, name="query")(y)
        k = nn.Dense(d, dtype=self.dtype, name="key")(y)
        v = nn.Dense(d, dtype=self.dtype, name="value")(y)
        y = attention(q, k, v, self.num_heads)
        y = nn.Dense(d, dtype=self.dtype, name="out")(y)
        y = LayerScale(dim=d, init_value=self.ls_init, name="ls1")(y)
        x = x + y
        y = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="ln2"
        )(x)
        y = nn.Dense(4 * d, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=self.dtype, name="fc2")(y)
        y = LayerScale(dim=d, init_value=self.ls_init, name="ls2")(y)
        return x + y


class DinoV2ViT(nn.Module):
    """DINOv2-family encoder returning an ``(B, H/16, W/16, D)`` feature map.

    ``pretrained_grid`` is the position-embedding grid side; matches the
    ported checkpoint (224/14 = 16 for facebook/dinov2-*, which is also the
    fine-tune grid at 256px / patch 16 — no interpolation in the hot path).
    """

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 16
    pretrained_grid: int = 16
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
            "cls_token", nn.initializers.normal(stddev=0.02),
            (1, 1, self.embed_dim), jnp.float32,
        )
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(stddev=0.02),
            (1, self.pretrained_grid ** 2 + 1, self.embed_dim), jnp.float32,
        )
        self.blocks = [
            DinoV2Block(num_heads=self.num_heads, dtype=self.dtype, name=f"block{i}")
            for i in range(self.depth)
        ]
        self.ln = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="ln"
        )

    def _pos(self, grid: tuple[int, int]) -> jax.Array:
        gh, gw = grid
        pos = self.pos_embed
        if (gh, gw) == (self.pretrained_grid, self.pretrained_grid):
            return pos
        # HF Dinov2Embeddings.interpolate_pos_encoding: fp32 bicubic,
        # align_corners=False
        cls_pos, grid_pos = pos[:, :1], pos[:, 1:]
        grid_pos = grid_pos.reshape(
            1, self.pretrained_grid, self.pretrained_grid, self.embed_dim
        )
        grid_pos = bicubic_resize_2d(grid_pos, (gh, gw), align_corners=False)
        return jnp.concatenate(
            [cls_pos, grid_pos.reshape(1, gh * gw, self.embed_dim)], axis=1
        )

    def embed(self, x: jax.Array) -> tuple[jax.Array, tuple[int, int]]:
        """Patch-embed + grid position embeddings, NO cls token (multiview)."""
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        tokens = self.patch_embed(x.astype(self.dtype)).reshape(
            b, gh * gw, self.embed_dim
        )
        pos = self._pos((gh, gw))
        return tokens + pos[:, 1:].astype(tokens.dtype), (gh, gw)

    def encode_tokens(
        self, tokens: jax.Array, grid: tuple[int, int] | None = None,
        num_views: int = 1,
    ) -> jax.Array:
        for block in self.blocks:
            tokens = block(tokens)
        return self.ln(tokens)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        patches = self.patch_embed(x.astype(self.dtype)).reshape(
            b, gh * gw, self.embed_dim
        )
        cls = jnp.tile(self.cls_token.astype(patches.dtype), (b, 1, 1))
        tokens = jnp.concatenate([cls, patches], axis=1)
        tokens = tokens + self._pos((gh, gw)).astype(tokens.dtype)
        tokens = self.encode_tokens(tokens)
        return tokens[:, 1:, :].reshape(b, gh, gw, self.embed_dim)


def rope_cos_sin(
    grid: tuple[int, int], head_dim: int, theta: float
) -> tuple[np.ndarray, np.ndarray]:
    """DINOv3 axial RoPE tables over patch-center coordinates.

    Returns float32 (N, head_dim) cos/sin with N = gh * gw. Pure numpy —
    a trace-time constant under jit (static grid).
    """
    gh, gw = grid
    coords_h = (np.arange(0.5, gh, dtype=np.float64) / gh)
    coords_w = (np.arange(0.5, gw, dtype=np.float64) / gw)
    ch, cw = np.meshgrid(coords_h, coords_w, indexing="ij")
    coords = np.stack([ch, cw], axis=-1).reshape(-1, 2) * 2.0 - 1.0  # (N, 2)
    inv_freq = 1.0 / theta ** np.arange(0, 1, 4 / head_dim, dtype=np.float64)
    angles = 2 * np.pi * coords[:, :, None] * inv_freq[None, None, :]
    angles = angles.reshape(coords.shape[0], -1)
    angles = np.tile(angles, (1, 2))  # (N, head_dim)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope(
    x: jax.Array, cos: jax.Array, sin: jax.Array, num_prefix: int
) -> jax.Array:
    """Apply RoPE to the patch tokens of (B, N, H, hd), skipping prefix."""
    prefix, patches = x[:, :num_prefix], x[:, num_prefix:]
    c = cos[None, :, None, :].astype(patches.dtype)
    s = sin[None, :, None, :].astype(patches.dtype)
    patches = patches * c + _rotate_half(patches) * s
    return jnp.concatenate([prefix, patches], axis=1)


class DinoV3Block(nn.Module):
    num_heads: int
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, cos: jax.Array, sin: jax.Array, num_prefix: int
    ) -> jax.Array:
        d = x.shape[-1]
        h = self.num_heads
        hd = d // h
        y = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="ln1"
        )(x)
        b, n, _ = y.shape
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(y).reshape(b, n, h, hd)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="k_proj")(y).reshape(
            b, n, h, hd
        )
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(y)
        q = _apply_rope(q, cos, sin, num_prefix).reshape(b, n, d)
        k = _apply_rope(k, cos, sin, num_prefix).reshape(b, n, d)
        y = attention(q, k, v, h)
        y = nn.Dense(d, dtype=self.dtype, name="o_proj")(y)
        y = LayerScale(dim=d, name="ls1")(y)
        x = x + y
        y = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="ln2"
        )(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="up_proj")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=self.dtype, name="down_proj")(y)
        y = LayerScale(dim=d, name="ls2")(y)
        return x + y


class DinoV3ViT(nn.Module):
    """DINOv3 encoder: register tokens + axial RoPE, no learned pos embed.

    Train-time patch-coordinate augmentation (HF pos_embed_rescale jitter) is
    intentionally omitted — coordinates are deterministic here (documented
    divergence; eval-path numerics match HF exactly).
    """

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 16
    num_register_tokens: int = 4
    rope_theta: float = 100.0
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
            "cls_token", nn.initializers.normal(stddev=0.02),
            (1, 1, self.embed_dim), jnp.float32,
        )
        self.register_tokens = self.param(
            "register_tokens", nn.initializers.normal(stddev=0.02),
            (1, self.num_register_tokens, self.embed_dim), jnp.float32,
        )
        mlp_dim = 4 * self.embed_dim
        self.blocks = [
            DinoV3Block(
                num_heads=self.num_heads, mlp_dim=mlp_dim, dtype=self.dtype,
                name=f"block{i}",
            )
            for i in range(self.depth)
        ]
        self.ln = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="ln"
        )

    def embed(self, x: jax.Array) -> tuple[jax.Array, tuple[int, int]]:
        """Patch tokens only (no prefix tokens, no pos add — RoPE is applied
        inside attention via encode_tokens)."""
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        tokens = self.patch_embed(x.astype(self.dtype)).reshape(
            b, gh * gw, self.embed_dim
        )
        return tokens, (gh, gw)

    def encode_tokens(
        self, tokens: jax.Array, grid: tuple[int, int] | None = None,
        num_views: int = 1,
    ) -> jax.Array:
        """Blocks + final LN. ``grid`` is required (RoPE); for multiview the
        per-view coordinate tables are tiled ``num_views`` times so each
        view's patches keep their own spatial phases."""
        if grid is None:
            raise ValueError("DinoV3ViT.encode_tokens requires the patch grid")
        head_dim = self.embed_dim // self.num_heads
        cos_np, sin_np = rope_cos_sin(grid, head_dim, self.rope_theta)
        cos = jnp.asarray(np.tile(cos_np, (num_views, 1)))
        sin = jnp.asarray(np.tile(sin_np, (num_views, 1)))
        num_prefix = tokens.shape[1] - cos.shape[0]
        for block in self.blocks:
            tokens = block(tokens, cos, sin, num_prefix)
        return self.ln(tokens)

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b = x.shape[0]
        patches, (gh, gw) = self.embed(x)
        cls = jnp.tile(self.cls_token.astype(patches.dtype), (b, 1, 1))
        reg = jnp.tile(self.register_tokens.astype(patches.dtype), (b, 1, 1))
        tokens = jnp.concatenate([cls, reg, patches], axis=1)
        tokens = self.encode_tokens(tokens, grid=(gh, gw))
        num_prefix = 1 + self.num_register_tokens
        return tokens[:, num_prefix:, :].reshape(b, gh, gw, self.embed_dim)
