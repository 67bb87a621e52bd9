"""Torch-exact bicubic interpolation as static matrices.

Several reference backbones resize learned position embeddings *inside the
forward pass* with ``torch.nn.functional.interpolate(mode="bicubic")``
(HF Hiera pos-embed background, reference vit_sam2.py; DINOv2/ViT
``interpolate_pos_encoding``). To port weights with numerical parity the
TPU build reproduces torch's cubic-convolution kernel (A = -0.75, edge
clamping) exactly — expressed as a pair of 1-D interpolation matrices so the
resize is two small matmuls (MXU-friendly) instead of a gather.

Matrices are built with numpy at trace time (shapes are static under jit).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["cubic_resize_matrix", "bicubic_resize_2d"]

_A = -0.75  # torch's cubic convolution coefficient


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """Four tap weights of torch's cubic convolution at fractional offset t.

    Returns shape ``t.shape + (4,)`` for taps at floor(x) - 1 .. floor(x) + 2.
    """
    a = _A
    w0 = ((a * (t + 1) - 5 * a) * (t + 1) + 8 * a) * (t + 1) - 4 * a
    w1 = ((a + 2) * t - (a + 3)) * t * t + 1
    s = 1 - t
    w2 = ((a + 2) * s - (a + 3)) * s * s + 1
    w3 = 1.0 - w0 - w1 - w2
    return np.stack([w0, w1, w2, w3], axis=-1)


def cubic_resize_matrix(
    in_size: int, out_size: int, align_corners: bool = False
) -> np.ndarray:
    """1-D bicubic interpolation matrix ``M`` with ``out = M @ in``.

    Matches ``torch.nn.functional.interpolate(mode="bicubic",
    align_corners=...)`` without antialiasing (torch's default; correct for
    upsampling, which is the only in-graph use).
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float64)
    i = np.arange(out_size, dtype=np.float64)
    if align_corners and out_size > 1:
        center = i * (in_size - 1) / (out_size - 1)
    else:
        center = (i + 0.5) * (in_size / out_size) - 0.5
    ix = np.floor(center)
    t = center - ix
    weights = _cubic_weights(t)  # (out, 4)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in range(4):
        idx = np.clip(ix + tap - 1, 0, in_size - 1).astype(np.int64)
        np.add.at(mat, (np.arange(out_size), idx), weights[:, tap])
    return mat


def bicubic_resize_2d(
    x: jax.Array,
    out_hw: tuple[int, int],
    align_corners: bool = False,
    h_axis: int = -3,
    w_axis: int = -2,
) -> jax.Array:
    """Torch-exact bicubic resize of the (H, W) axes of ``x``.

    Defaults assume NHWC layout. Computed in float32 and cast back.
    """
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = out_hw
    dtype = x.dtype
    y = x.astype(jnp.float32)
    if out_h != in_h:
        mh = jnp.asarray(cubic_resize_matrix(in_h, out_h, align_corners), jnp.float32)
        y = jnp.tensordot(mh, y, axes=[[1], [h_axis]])
        y = jnp.moveaxis(y, 0, h_axis)
    if out_w != in_w:
        mw = jnp.asarray(cubic_resize_matrix(in_w, out_w, align_corners), jnp.float32)
        y = jnp.tensordot(mw, y, axes=[[1], [w_axis]])
        y = jnp.moveaxis(y, 0, w_axis)
    return y.astype(dtype)
