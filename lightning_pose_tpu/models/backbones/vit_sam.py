"""SAM (ViTDet-style) vision encoder in Flax — NHWC in, feature map out.

Faithful TPU re-implementation of the architecture the reference wraps
(reference lightning_pose/models/backbones/vit_sam.py): patch-16 embedding,
a spatial absolute position embedding (bicubic-resized to the fine-tune grid
at weight-port time, reference vit_sam.py:142-176), and 12 transformer
layers using 14x14 *windowed* attention except at the global-attention
indexes. Matching the reference wrapper, relative position embeddings are
disabled (reference vit_sam.py:71-75) and the FPN neck is dropped — the
output is the raw stride-16 token grid with NO final layernorm.

TPU notes: window partition is pure reshape/transpose under static shapes
(free for XLA); attention stays MXU-batched over (B * num_windows) windows.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from lightning_pose_tpu.models.backbones.vit_dino import attention

__all__ = ["SamViT", "window_partition", "window_unpartition"]


def window_partition(
    x: jax.Array, window: int
) -> tuple[jax.Array, tuple[int, int]]:
    """(B, H, W, C) -> (B * nWin, win, win, C), zero-padding bottom/right."""
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    ph, pw = h + pad_h, w + pad_w
    x = x.reshape(b, ph // window, window, pw // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (ph, pw)


def window_unpartition(
    windows: jax.Array,
    window: int,
    padded_hw: tuple[int, int],
    hw: tuple[int, int],
) -> jax.Array:
    """Inverse of :func:`window_partition`, cropping the padding."""
    ph, pw = padded_hw
    h, w = hw
    c = windows.shape[-1]
    b = windows.shape[0] // ((ph // window) * (pw // window))
    x = windows.reshape(b, ph // window, pw // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c)
    return x[:, :h, :w, :]


class SamBlock(nn.Module):
    num_heads: int
    window_size: int  # 0 = global attention
    mlp_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        residual = x
        y = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="ln1"
        )(x)
        if self.window_size > 0:
            h, w = y.shape[1], y.shape[2]
            y, padded_hw = window_partition(y, self.window_size)
        b, wh, ww, _ = y.shape
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(
            y.reshape(b, wh * ww, d)
        )
        q, k, v = jnp.split(qkv, 3, axis=-1)
        y = attention(q, k, v, self.num_heads)
        y = nn.Dense(d, dtype=self.dtype, name="proj")(y)
        y = y.reshape(b, wh, ww, d)
        if self.window_size > 0:
            y = window_unpartition(y, self.window_size, padded_hw, (h, w))
        x = residual + y
        y = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="ln2"
        )(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=self.dtype, name="lin2")(y)
        return x + y


class SamViT(nn.Module):
    """SAM vision encoder (neck dropped, rel-pos disabled).

    ``pos_grid`` is the spatial side of the stored position embedding —
    the fine-tune grid (image_size / 16); the weight port resizes SAM's
    native 64x64 table down to it with antialiased bicubic, mirroring the
    reference's init-time ``_resize_pos_embed`` (vit_sam.py:142-176).
    Inputs at other resolutions get an in-graph bicubic resize.
    """

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    patch_size: int = 16
    window_size: int = 14
    global_attn_indexes: tuple[int, ...] = (2, 5, 8, 11)
    pos_grid: int = 16
    dtype: Any = jnp.float32

    def setup(self) -> None:
        self.patch_embed = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="patch_embed",
        )
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.zeros,
            (1, self.pos_grid, self.pos_grid, self.embed_dim), jnp.float32,
        )
        self.blocks = [
            SamBlock(
                num_heads=self.num_heads,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                mlp_dim=4 * self.embed_dim,
                dtype=self.dtype,
                name=f"block{i}",
            )
            for i in range(self.depth)
        ]

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, h, w, _ = x.shape
        gh, gw = h // self.patch_size, w // self.patch_size
        tokens = self.patch_embed(x.astype(self.dtype))  # (B, gh, gw, D)
        pos = self.pos_embed
        if (gh, gw) != (self.pos_grid, self.pos_grid):
            from lightning_pose_tpu.ops.interpolate import bicubic_resize_2d

            pos = bicubic_resize_2d(pos, (gh, gw), align_corners=False)
        tokens = tokens + pos.astype(tokens.dtype)
        for block in self.blocks:
            tokens = block(tokens)
        return tokens  # NHWC, stride 16, no final LN (neck dropped)
