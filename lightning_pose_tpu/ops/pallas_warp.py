"""Pallas TPU kernel: bilinear image warp as one-hot interpolation matmuls.

The augmentation engine samples each image ONCE over a composed geometric
grid (``ops/augment.py`` — the fused replacement for the reference's
sequential imgaug ops, reference lightning_pose/data/augmentations.py:136-221).
As plain XLA that sample is a 4-tap ``lax.gather``, and TPU gathers execute
per element: at bs16/256px the single warp measured ~39 ms — two thirds of
the whole ResNet-50 train step.

This kernel replaces the gather with MXU work. Bilinear interpolation is a
linear map, so for each output pixel row the horizontal interpolation is a
matmul against a 2-banded "one-hot" weight matrix built on the fly from the
sampling positions::

    wx[i, u] = relu(1 - |px[i] - u|)          # <=2 nonzeros per row
    A[i, (c,v)] = sum_u wx[i, u] * img[v, u, c]    # MXU matmul
    out[i, c]  = sum_v wy[i, v] * A[i, (c,v)]      # VPU lane reduction

Summing only over in-range taps reproduces the zero-padding 4-tap bilinear
exactly (taps outside the frame contribute nothing), so the kernel is a
drop-in for ``grid_sample_bilinear`` up to bf16 rounding of the weights
(parity-tested in tests/ops/test_pallas_warp.py). Images are 0-255, so the
~2^-8 relative matmul error is below one gray level — smaller than cv2's
own 5-bit fixed-point bilinear quantization that the reference inherits
through imgaug.

Layout notes (TPU tiling): the image enters as ``(W, C*H)`` so the
contraction dim u sits on sublanes and the (channel-major, row) pairs on
lanes; per-channel slices of ``A`` are contiguous 128-aligned lane ranges.
Requires H and W multiples of 128 (the config validator already enforces
%128 resize dims); callers fall back to the gather otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["warp_bilinear_pallas", "pallas_warp_supported"]

_BR = 8    # output row tile (f32 sublane minimum)
_BW = 128  # output col tile (lane width)


def pallas_warp_supported(images_shape: tuple[int, ...],
                          coords_shape: tuple[int, ...]) -> bool:
    """True when the matmul kernel handles this (B,H,W,C) / (B,Ho,Wo,2) pair."""
    if len(images_shape) != 4 or len(coords_shape) != 4:
        return False
    b, h, w, c = images_shape
    if coords_shape != (b, h, w, 2):  # same-size warps only
        return False
    return c == 3 and h % 128 == 0 and w % 128 == 0


def _warp_kernel(img_ref, px_ref, py_ref, out_ref):
    # img_ref: (1, W, C*H) bf16 with img_t[u, c*H + v] = image[v, u, c]
    # px_ref/py_ref: (1, BR, BW) f32 sampling positions for this output tile
    # out_ref: (1, C, BR, BW) f32
    w = img_ref.shape[1]
    c = out_ref.shape[1]
    h = img_ref.shape[2] // c
    br, bw = px_ref.shape[1], px_ref.shape[2]

    px = px_ref[0]  # (BR, BW)
    py = py_ref[0]
    iu = jax.lax.broadcasted_iota(jnp.int32, (br, bw, w), 2).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, :, None] - iu))
    a = jax.lax.dot_general(
        wx.astype(jnp.bfloat16).reshape(br * bw, w),
        img_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(br, bw, c * h)
    iv = jax.lax.broadcasted_iota(jnp.int32, (br, bw, h), 2).astype(jnp.float32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, :, None] - iv))
    for ch in range(c):
        out_ref[0, ch] = jnp.sum(wy * a[:, :, ch * h:(ch + 1) * h], axis=-1)


def warp_bilinear_pallas(images: jax.Array, coords: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """Sample ``images (B, H, W, C)`` at ``coords (B, H, W, 2)`` (x, y),
    bilinear with zero padding outside — gather-free TPU path."""
    b, h, w, c = images.shape
    assert pallas_warp_supported(images.shape, coords.shape), (
        images.shape, coords.shape)
    # (B, W, C, H) -> (B, W, C*H): contraction dim on sublanes
    img_t = images.transpose(0, 2, 3, 1).reshape(b, w, c * h)
    img_t = img_t.astype(jnp.bfloat16)
    px = coords[..., 0]
    py = coords[..., 1]
    out_t = pl.pallas_call(
        _warp_kernel,
        grid=(b, h // _BR, w // _BW),
        in_specs=[
            pl.BlockSpec((1, w, c * h), lambda bi, yi, xi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BR, _BW), lambda bi, yi, xi: (bi, yi, xi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BR, _BW), lambda bi, yi, xi: (bi, yi, xi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, _BR, _BW), lambda bi, yi, xi: (bi, 0, yi, xi),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        interpret=interpret,
    )(img_t, px, py)
    return out_t.transpose(0, 2, 3, 1)
