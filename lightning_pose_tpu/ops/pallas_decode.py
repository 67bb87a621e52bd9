"""Pallas TPU kernel for the fused soft-argmax decode.

The XLA decode path (ops/softargmax.py) materializes the 2^df-upsampled
heatmaps in HBM: for a 64-frame x 17-keypoint batch at 256x256 that is
~285 MB of intermediate traffic per batch. This kernel exploits two facts:

1. The whole upsample pipeline (bicubic 2x + pyramid-Gaussian blur, twice)
   is a **separable linear map**: ``up = M @ hm @ M^T`` with a constant
   ``(H_out, H_in)`` matrix ``M`` (composition of the per-level 1-D
   interpolation and blur matrices). Two small MXU matmuls per map.
2. Softmax, expectation, and windowed confidence are reductions — nothing
   larger than one (H_out, W_out) map is ever needed at once.

So the kernel runs one grid program per (frame, keypoint) map: DMA the
64x64 input block to VMEM, two matmuls, softmax + expectation + masked
window sum entirely in VMEM, and write 3 scalars. HBM traffic drops from
~300 MB to ~18 MB per batch.

Numerics match ops/softargmax.py exactly up to float associativity (the
linear-map composition is the same operator); used for inference — the
training path keeps the differentiable XLA version.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["run_subpixelmaxima_pallas", "upsample_matrix"]


@functools.lru_cache(maxsize=8)
def upsample_matrix(in_size: int, downsample_factor: int) -> np.ndarray:
    """1-D linear operator of ``downsample_factor`` rounds of (bicubic 2x
    upsample + [1,4,6,4,1]/16 blur with zero boundary)."""
    m = np.eye(in_size, dtype=np.float64)
    size = in_size
    kernel1d = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    for _ in range(downsample_factor):
        # bicubic 2x resize as a matrix: resize each identity column
        # (computed eagerly even when called during an outer jit trace)
        with jax.ensure_compile_time_eval():
            u = np.asarray(
                jax.image.resize(
                    jnp.eye(size, dtype=jnp.float32), (2 * size, size),
                    method="bicubic",
                )
            ).astype(np.float64)
        # banded blur matrix with zero (constant) boundary
        b = np.zeros((2 * size, 2 * size))
        for offset, w in zip(range(-2, 3), kernel1d):
            diag = np.eye(2 * size, k=offset) * w
            b += diag
        m = b @ u @ m
        size *= 2
    return m.astype(np.float32)


def _decode_kernel(hm_ref, m_ref, out_ref, *, temperature: float, window: int):
    """One (frame, keypoint) map: upsample via matmuls, softmax,
    expectation, windowed confidence."""
    hm = hm_ref[0]  # (H_in, W_in)
    m = m_ref[:]  # (H_out, H_in)

    t1 = jnp.dot(m, hm, preferred_element_type=jnp.float32)  # (H_out, W_in)
    up = jnp.dot(t1, m.T, preferred_element_type=jnp.float32)  # (H_out, W_out)

    h_out, w_out = up.shape
    z = up * temperature
    z_max = jnp.max(z)
    e = jnp.exp(z - z_max)
    s = jnp.sum(e)

    rows = jax.lax.broadcasted_iota(jnp.int32, (h_out, w_out), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h_out, w_out), 1).astype(jnp.float32)
    px = jnp.sum(e * cols) / s
    py = jnp.sum(e * rows) / s

    # windowed confidence: sum of softmax mass within +-window of the
    # truncated-int peak (zero outside bounds, matching the reference's
    # zero padding)
    xi = jnp.floor(px)
    yi = jnp.floor(py)
    mask = (
        (jnp.abs(rows - yi) <= window) & (jnp.abs(cols - xi) <= window)
    ).astype(jnp.float32)
    conf = jnp.sum(e * mask) / s

    # assemble the (1, 8, 128) output tile without scatter (unsupported in
    # the TPU lowering): select by lane/sublane index
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    tile = jnp.where(
        (row_ids == 0) & (col_ids == 0), px,
        jnp.where(
            (row_ids == 0) & (col_ids == 1), py,
            jnp.where((row_ids == 0) & (col_ids == 2), conf, 0.0),
        ),
    )
    out_ref[:] = tile[None]


def run_subpixelmaxima_pallas(
    heatmaps: jax.Array,
    downsample_factor: int = 2,
    temperature: float = 1000.0,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused decode (drop-in for ops.softargmax.run_subpixelmaxima).

    Args:
        heatmaps: (B, H, W, K) normalized heatmaps.
        interpret: run in interpreter mode (for CPU tests).

    Returns:
        ((B, 2K) keypoints, (B, K) confidences).
    """
    b, h, w, k = heatmaps.shape
    assert h == w, "pallas decode currently assumes square heatmaps"
    m = jnp.asarray(upsample_matrix(h, downsample_factor))

    # (B, H, W, K) -> (B*K, H, W): one grid program per map
    maps = heatmaps.transpose(0, 3, 1, 2).reshape(b * k, h, w).astype(jnp.float32)

    kernel = functools.partial(
        _decode_kernel,
        temperature=temperature,
        window=int(np.floor(1.25 * 2)),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * k,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m.shape[0], m.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * k, 8, 128), jnp.float32),
        interpret=interpret,
    )(maps, m)

    px = out[:, 0, 0].reshape(b, k)
    py = out[:, 0, 1].reshape(b, k)
    conf = out[:, 0, 2].reshape(b, k)
    offset = {0: 0.0, 1: 0.5, 2: 1.5, 3: 2.5}[downsample_factor]
    preds = jnp.stack([px - offset, py - offset], axis=-1)  # (B, K, 2)
    return preds.reshape(b, 2 * k), conf
