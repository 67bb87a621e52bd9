"""SAM2 Hiera hierarchical vision trunk in Flax — NHWC in, stride-32 map out.

Faithful TPU re-implementation of the Hiera backbone the reference wraps
(reference lightning_pose/models/backbones/vit_sam2.py, which keeps the
``Sam2HieraDetModel`` trunk and drops the FPN neck): a 7x7/stride-4 patch
embedding, windowed positional embedding (bicubic-resized background + tiled
window component), and four stages of windowed-attention blocks. Stage
transitions double the embedding dim (linear proj on the skip path) and
2x2-max-pool the attention queries, so the final stage runs at stride
4 * 2^3 = 32 (reference backbones/factory.py:121-123).

Per-stage geometry (HF Sam2HieraDetConfig):
- embed dim and head count double each stage;
- window sizes per stage (8, 4, 14, 7); designated global-attention blocks
  use full attention;
- the first block of a stage attends at the *previous* stage's window size
  and max-pools its queries 2x2 (the "q-pool" stage change).

TPU notes: all window partitions are static reshapes; attention is batched
over (B * num_windows) on the MXU; the pos-embed background resize is a
torch-exact bicubic matmul (ops/interpolate.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from lightning_pose_tpu.models.backbones.vit_sam import (
    window_partition,
    window_unpartition,
)
from lightning_pose_tpu.ops.interpolate import bicubic_resize_2d

__all__ = ["Hiera", "HIERA_CONFIGS"]

# name -> dict of per-variant fields (SAM2.1 tiny / small / base-plus)
HIERA_CONFIGS: dict[str, dict[str, Any]] = {
    "vitt_sam2": dict(
        embed_dim=96, num_heads=1, blocks_per_stage=(1, 2, 7, 2),
        global_attention_blocks=(5, 7, 9), bkg_size=7,
    ),
    "vits_sam2": dict(
        embed_dim=96, num_heads=1, blocks_per_stage=(1, 2, 11, 2),
        global_attention_blocks=(7, 10, 13), bkg_size=7,
    ),
    "vitb_sam2": dict(
        embed_dim=112, num_heads=2, blocks_per_stage=(2, 3, 16, 3),
        global_attention_blocks=(12, 16, 20), bkg_size=14,
    ),
}


def _max_pool_2x2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) 2x2/2 max pool (Hiera's q-pool / skip pool)."""
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class HieraAttention(nn.Module):
    """Multi-scale attention: fused qkv (dim -> 3*dim_out), optional 2x2
    max-pooling of queries at stage changes."""

    dim_out: int
    num_heads: int
    q_pool: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, _ = x.shape
        hd = self.dim_out // self.num_heads
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:
            q = _max_pool_2x2(q.reshape(b, h, w, self.num_heads * hd))
            h, w = q.shape[1], q.shape[2]
            q = q.reshape(b, h * w, self.num_heads, hd)
        scale = hd ** -0.5
        q = q.transpose(0, 2, 1, 3) * scale
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)


class HieraBlock(nn.Module):
    dim: int
    dim_out: int
    num_heads: int
    window_size: int  # 0 = global attention
    q_pool: bool = False
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        y = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="ln1"
        )(x)
        if self.dim != self.dim_out:
            residual = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(y)
            if self.q_pool:
                residual = _max_pool_2x2(residual)

        window = self.window_size
        if window > 0:
            h, w = y.shape[1], y.shape[2]
            y, padded_hw = window_partition(y, window)
        y = HieraAttention(
            dim_out=self.dim_out, num_heads=self.num_heads, q_pool=self.q_pool,
            dtype=self.dtype, name="attn",
        )(y)
        if self.q_pool:
            # shapes shrank 2x inside the attention; recompute the window
            # geometry relative to the pooled residual (HF Sam2MultiScaleBlock)
            window = self.window_size // 2
            rh, rw = residual.shape[1], residual.shape[2]
            padded_hw = (
                rh + (window - rh % window) % window if window else rh,
                rw + (window - rw % window) % window if window else rw,
            )
            out_hw = (rh, rw)
        else:
            out_hw = (h, w) if self.window_size > 0 else None
        if self.window_size > 0:
            y = window_unpartition(y, window, padded_hw, out_hw)

        x = residual + y
        y = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="ln2"
        )(x)
        y = nn.Dense(
            int(self.dim_out * self.mlp_ratio), dtype=self.dtype, name="fc1"
        )(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim_out, dtype=self.dtype, name="fc2")(y)
        return x + y


class Hiera(nn.Module):
    """SAM2 Hiera trunk. Input (B, H, W, 3) -> (B, H/32, W/32, 8*embed_dim)."""

    embed_dim: int = 96
    num_heads: int = 1
    blocks_per_stage: tuple[int, ...] = (1, 2, 7, 2)
    global_attention_blocks: tuple[int, ...] = (5, 7, 9)
    window_size_per_stage: tuple[int, ...] = (8, 4, 14, 7)
    num_query_pool_stages: int = 3
    bkg_size: int = 7
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @property
    def out_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.blocks_per_stage) - 1)

    def setup(self) -> None:
        self.patch_embed = nn.Conv(
            self.embed_dim, (7, 7), strides=(4, 4), padding=((3, 3), (3, 3)),
            dtype=self.dtype, name="patch_embed",
        )
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.zeros,
            (1, self.bkg_size, self.bkg_size, self.embed_dim), jnp.float32,
        )
        ws0 = self.window_size_per_stage[0]
        self.pos_embed_window = self.param(
            "pos_embed_window", nn.initializers.zeros,
            (1, ws0, ws0, self.embed_dim), jnp.float32,
        )

        blocks = []
        total = 0
        for stage, n_blocks in enumerate(self.blocks_per_stage):
            for block_idx in range(n_blocks):
                first_of_stage = stage > 0 and block_idx == 0
                dim = self.embed_dim * 2 ** (stage - 1 if first_of_stage else stage)
                dim_out = self.embed_dim * 2 ** stage
                window = self.window_size_per_stage[
                    stage - 1 if first_of_stage else stage
                ]
                if total in self.global_attention_blocks:
                    window = 0
                q_pool = first_of_stage and stage <= self.num_query_pool_stages
                blocks.append(
                    HieraBlock(
                        dim=dim, dim_out=dim_out,
                        num_heads=self.num_heads * 2 ** stage,
                        window_size=window, q_pool=q_pool,
                        mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                        name=f"block{total}",
                    )
                )
                total += 1
        self.blocks = blocks

    def _pos(self, hw: tuple[int, int]) -> jax.Array:
        """Windowed positional embedding: bicubic background + tiled window
        component (HF Sam2HieraDetModel._get_pos_embed)."""
        h, w = hw
        pos = bicubic_resize_2d(self.pos_embed, (h, w), align_corners=False)
        win = self.pos_embed_window
        ws = win.shape[1]
        reps_h, reps_w = -(-h // ws), -(-w // ws)
        win = jnp.tile(win, (1, reps_h, reps_w, 1))[:, :h, :w, :]
        return pos + win

    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        tokens = self.patch_embed(x.astype(self.dtype))  # (B, H/4, W/4, D)
        tokens = tokens + self._pos(tokens.shape[1:3]).astype(tokens.dtype)
        for block in self.blocks:
            tokens = block(tokens)
        return tokens  # NHWC, stride 32
