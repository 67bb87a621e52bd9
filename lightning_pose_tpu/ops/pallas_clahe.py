"""Pallas TPU kernel: tiled-CLAHE LUT interpolation without materialized
one-hots.

``ops/augment.py:_equalize_clahe_tiled`` implements cv2's CLAHE (the
reference's imgaug ``AllChannelsCLAHE`` wraps it, reference
lightning_pose/data/augmentations.py:203-205) in two stages: per-tile
clip-limited LUT construction (MXU nibble histograms — cheap), then a
bilinear blend of the four nearest tile LUTs at every pixel. As plain XLA
that second stage materializes per-corner one-hot and LUT-row tensors in
HBM (~50 MB per image-channel round-tripped), and profiling showed it
dominating the sparse CLAHE cost (+2.45 ms of a 6.3 ms dlc augmentation
apply at bs16/256px).

The kernel fuses the blend into VMEM. The half-block identity (see
``_equalize_clahe_tiled``) makes the four corner tile indices constant
within each half-block, and the bilinear weights are a static separable
(H, W) map, so for one half-block row the blend factorizes into

    lx_lo = SW @ lut[ylo]      # (W, 256): x-interpolated LUT per column
    lx_hi = SW @ lut[yhi]      #   SW (W, g) static: <=2 nonzeros per row,
                               #   (1-wx)*onehot(xlo) + wx*onehot(xhi)
    out[y, x] = (1-wy[y]) * lx_lo[x, v[y, x]] + wy[y] * lx_hi[x, v[y, x]]

i.e. two tiny MXU matmuls plus a per-pixel 256-bin one-hot lookup that
never leaves VMEM. HBM traffic drops to reading the pixels + tile LUTs and
writing the result.

Grid layout: ONE program per image-channel with an in-kernel ``fori_loop``
over half-block rows. Requires the half-block row height ``H/(2g)`` to be
a multiple of 8 (f32 sublanes) and ``W`` a multiple of 128 (lanes);
callers fall back to the XLA form otherwise.

Negative results, measured so they stay dead: (a) a global-LUT variant for
plain histogram equalization lost to the existing XLA nibble-matmul apply
— with ONE shared table per image the lookup is an MXU problem and the
VPU one-hot can't compete; this kernel pays off only because CLAHE's
x-interpolated tables vary per pixel column. (b) per-(image-channel,
half-block-row) grid programs spent more in dispatch than in their ~2 us
of compute. (c) batched nibble ``dot_general`` per half-block pads K=16,
N=16 up to the 128-wide MXU and loses the FLOP advantage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["clahe_apply_pallas", "pallas_clahe_supported"]


def pallas_clahe_supported(h: int, w: int, g: int) -> bool:
    """True when the fused blend kernel handles (H, W) with a g x g grid."""
    if g <= 1 or h % (2 * g) or w % (2 * g):
        return False
    hh = h // (2 * g)
    return hh % 8 == 0 and w % 128 == 0


@functools.lru_cache(maxsize=8)
def _static_maps(h: int, w: int, g: int):
    """Static x-selection/weight matrix SW (W, g) and row weights (2g, hh)."""
    th, tw = h // g, w // g
    hw = tw // 2
    # fractional position between tile centers (matches the XLA path)
    wx = np.mod((np.arange(w, dtype=np.float32) + 0.5) / tw - 0.5, 1.0)
    wy = np.mod((np.arange(h, dtype=np.float32) + 0.5) / th - 0.5, 1.0)
    cb = np.arange(w) // hw  # half-block column per pixel column
    xlo = np.clip((cb - 1) // 2, 0, g - 1)
    xhi = np.clip((cb - 1) // 2 + 1, 0, g - 1)
    sw = np.zeros((w, g), dtype=np.float32)
    sw[np.arange(w), xlo] += 1.0 - wx
    sw[np.arange(w), xhi] += wx
    return sw, wy.reshape(2 * g, h // (2 * g))


def _lookup(v: jax.Array, table: jax.Array) -> jax.Array:
    """``table[x, v[y, x]]`` for v (R, W) int32, table (W, 256) f32."""
    r, w = v.shape
    bins = jax.lax.broadcasted_iota(jnp.int32, (r, w, 256), 2)
    return jnp.sum(jnp.where(v[:, :, None] == bins, table[None], 0.0), -1)


def _clahe_kernel(g: int, x_ref, lut_ref, sw_ref, wy_ref, out_ref):
    # x_ref: (1, H, W) f32 pixel values; lut_ref: (1, g, g, 256) f32
    # per-tile LUTs; sw_ref: (W, g) f32; wy_ref: (1, 2g, hh) f32;
    # out_ref: (1, H, W) f32
    h, w = x_ref.shape[1], x_ref.shape[2]
    hh = h // (2 * g)
    sw = sw_ref[...]
    hp = jax.lax.Precision.HIGHEST
    dims = (((1,), (0,)), ((), ()))

    def body(r, carry):
        lo = jnp.clip((r - 1) // 2, 0, g - 1)
        hi = jnp.clip((r - 1) // 2 + 1, 0, g - 1)
        lut_lo = lut_ref[0, pl.ds(lo, 1), :, :][0]  # (g, 256)
        lut_hi = lut_ref[0, pl.ds(hi, 1), :, :][0]
        lx_lo = jax.lax.dot_general(
            sw, lut_lo, dims, precision=hp,
            preferred_element_type=jnp.float32,
        )  # (W, 256)
        lx_hi = jax.lax.dot_general(
            sw, lut_hi, dims, precision=hp,
            preferred_element_type=jnp.float32,
        )
        rows = x_ref[0, pl.ds(r * hh, hh), :]
        v = jnp.clip(rows, 0.0, 255.0).astype(jnp.int32)  # (hh, W)
        wy = wy_ref[0, pl.ds(r, 1), :][0][:, None]  # (hh, 1)
        out = (1.0 - wy) * _lookup(v, lx_lo) + wy * _lookup(v, lx_hi)
        out_ref[0, pl.ds(r * hh, hh), :] = out
        return carry

    jax.lax.fori_loop(0, 2 * g, body, 0)


def clahe_apply_pallas(x: jax.Array, lut_grid: jax.Array, g: int,
                       interpret: bool = False) -> jax.Array:
    """Blend per-tile LUTs over pixels: ``x (N, H, W)`` 0-255 floats,
    ``lut_grid (N, g, g, 256)`` f32 LUTs (tile-row, tile-col), returns the
    bilinearly interpolated CLAHE output (N, H, W) f32."""
    n, h, w = x.shape
    assert pallas_clahe_supported(h, w, g), (x.shape, g)
    hh = h // (2 * g)
    sw, wy = _static_maps(h, w, g)
    return pl.pallas_call(
        functools.partial(_clahe_kernel, g),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, g, 256), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, g), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * g, hh), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), lut_grid.astype(jnp.float32), jnp.asarray(sw),
      jnp.asarray(wy).reshape(1, 2 * g, hh))
