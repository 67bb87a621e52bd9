"""Pallas TPU kernel: bilinear image warp as one-hot interpolation matmuls.

The augmentation engine samples each image ONCE over a composed geometric
grid (``ops/augment.py`` — the fused replacement for the reference's
sequential imgaug ops, reference lightning_pose/data/augmentations.py:136-221).
As plain XLA that sample is a 4-tap ``lax.gather``, and TPU gathers execute
per element: at bs16/256px the single warp measured ~39 ms — two thirds of
the whole ResNet-50 train step.

This kernel replaces the gather with MXU work. Bilinear interpolation is a
linear map, so for each output pixel the vertical interpolation is a matmul
against a 2-banded "one-hot" weight matrix built on the fly from the
sampling positions::

    wy[i, v] = relu(1 - |py[i] - v|)              # <=2 nonzeros per row
    A[i, (c,u)] = sum_v wy[i, v] * img[v, u, c]   # MXU matmul
    out[i, c]   = sum_u wx[i, u] * A[i, (c,u)]    # VPU lane reduction

Summing only over in-range taps reproduces the zero-padding 4-tap bilinear
exactly (taps outside the frame contribute nothing), so the kernel is a
drop-in for ``grid_sample_bilinear`` up to bf16 rounding of the weights
(parity-tested in tests/ops/test_pallas_warp.py). Images are 0-255, so the
~2^-8 relative matmul error is below one gray level — smaller than cv2's
own 5-bit fixed-point bilinear quantization that the reference inherits
through imgaug.

**Windowed contraction**: the matmul only needs input rows a tile actually
samples. For an (8, 128) output tile the sampled-row span is bounded by the
pipeline's static geometry (rotation/scale/elastic magnitudes — the caller
passes ``row_span_bound``), so the kernel contracts over a ``dynamic-slice``
row window of static size ``Hw`` anchored per tile at ``floor(min py)``
instead of all ``H`` rows. At 256px with the dlc preset (rot 25deg, croppad
0.15, elastic alpha<=10) Hw=112 — ~2.3x fewer MXU FLOPs than the full
contraction (which measured 412 GFLOP at bs16/256px, MXU-bound). Without a
bound (or when the bound reaches H, e.g. odd-k Rot90 pipelines) the window
is the whole image and the kernel degenerates to the full contraction.

Layout notes (TPU tiling): the image enters as ``(H, C*W)`` so the
contraction dim v sits on sublanes — dynamic row windows are 8-aligned
sublane slices — and the (channel-major, col) pairs on lanes; per-channel
slices of ``A`` are contiguous 128-aligned lane ranges. Requires H and W
multiples of 128 (the config validator already enforces %128 resize dims);
callers fall back to the gather otherwise.
"""

from __future__ import annotations

import functools

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


def row_window_size(row_span_bound: float | None, h: int) -> int:
    """Static row-window size covering a tile whose sampled rows span at
    most ``row_span_bound``: the bilinear taps add 2 rows and the 8-aligned
    anchor up to 7 more."""
    if row_span_bound is None:
        return h
    import math

    hw = math.ceil(float(row_span_bound)) + 2 + 7
    hw = ((hw + 7) // 8) * 8
    return min(h, hw)


def _warp_kernel(hw: int, img_ref, px_ref, py_ref, out_ref):
    # img_ref: (1, H, C*W) bf16 with img_t[v, c*W + u] = image[v, u, c]
    # px_ref/py_ref: (1, BR, BW) f32 sampling positions for this output tile
    # out_ref: (1, C, BR, BW) f32
    h = img_ref.shape[1]
    c = out_ref.shape[1]
    w = img_ref.shape[2] // c
    br, bw = px_ref.shape[1], px_ref.shape[2]

    px = px_ref[0]  # (BR, BW)
    py = py_ref[0]
    if hw >= h:
        v0 = jnp.int32(0)
        rows = img_ref[0]
    else:
        # anchor the static-size row window at this tile's lowest sampled
        # row (8-aligned sublane slice); the caller's span bound guarantees
        # every in-frame tap of the tile lands inside the window, and taps
        # outside the frame contribute zero by construction
        v0 = jnp.clip(
            jnp.floor(jnp.min(py)).astype(jnp.int32), 0, h - hw
        )
        v0 = (v0 // 8) * 8
        rows = img_ref[0, pl.ds(v0, hw), :]
    iv = (
        jax.lax.broadcasted_iota(jnp.int32, (br, bw, hw), 2)
        .astype(jnp.float32) + v0.astype(jnp.float32)
    )
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(py[:, :, None] - iv))
    a = jax.lax.dot_general(
        wy.astype(jnp.bfloat16).reshape(br * bw, hw),
        rows,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(br, bw, c * w)
    iu = jax.lax.broadcasted_iota(jnp.int32, (br, bw, w), 2).astype(jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(px[:, :, None] - iu))
    for ch in range(c):
        out_ref[0, ch] = jnp.sum(wx * a[:, :, ch * w:(ch + 1) * w], axis=-1)


def warp_bilinear_pallas(images: jax.Array, coords: jax.Array,
                         row_span_bound: float | None = None,
                         interpret: bool = False) -> jax.Array:
    """Sample ``images (B, H, W, C)`` at ``coords (B, H, W, 2)`` (x, y),
    bilinear with zero padding outside — gather-free TPU path.

    ``row_span_bound``: static upper bound on ``max(py) - min(py)`` within
    any (8, 128) output tile (derived from the augmentation spec's rotation/
    scale/elastic magnitudes); enables the windowed row contraction.
    """
    b, h, w, c = images.shape
    assert pallas_warp_supported(images.shape, coords.shape), (
        images.shape, coords.shape)
    hw = row_window_size(row_span_bound, h)
    # (B, H, C, W) -> (B, H, C*W): contraction dim v on sublanes
    img_t = images.transpose(0, 1, 3, 2).reshape(b, h, c * w)
    img_t = img_t.astype(jnp.bfloat16)
    px = coords[..., 0]
    py = coords[..., 1]
    out_t = pl.pallas_call(
        functools.partial(_warp_kernel, hw),
        grid=(b, h // _BR, w // _BW),
        in_specs=[
            pl.BlockSpec((1, h, c * w), lambda bi, yi, xi: (bi, 0, 0),
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
