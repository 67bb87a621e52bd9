"""Pallas TPU kernel: fused uint8 -> ImageNet-normalized bfloat16.

The inference/train hot path feeds uint8 frames to the device and
normalizes them before the backbone (``ops/preprocess.normalize_images``,
the TPU analog of the reference's torchvision ToTensor + Normalize,
reference lightning_pose/data/datasets.py:140-145). As plain XLA this is
an elementwise pass that reads B*H*W*3 uint8 bytes and, when the backbone
runs in bf16, writes 2x that in bf16 after a convert+scale+shift chain.

This kernel does the whole chain in one VMEM-resident pass:

    out = (u8 / 255 - mean_c) / std_c   (cast to bfloat16)

with the per-channel affine folded into two constant row vectors
(scale[col] = 1/(255*std[col%3]), bias[col] = -mean[col%3]/std[col%3])
over a (rows, W*3) 2-D view of the batch, so the channel-of-3 layout
never has to be tiled on the 128-lane axis. One FMA per element, uint8 in,
bf16 out — the memory-bound floor for this op.

Requires W*3 to be a multiple of 128 (true for all the reference's
resize widths: 128->384, 256->768, 384->1152); callers fall back to the
XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lightning_pose_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

__all__ = ["normalize_images_pallas", "pallas_preprocess_supported"]

_ROW_BLOCK = 256  # sublane-aligned row tile (multiple of 32 for uint8 in)


def pallas_preprocess_supported(shape: tuple[int, ...]) -> bool:
    """True when the fused kernel handles this (..., H, W, 3) shape."""
    if len(shape) < 3 or shape[-1] != 3:
        return False
    w3 = shape[-2] * 3
    rows = int(np.prod(shape[:-2]))
    return w3 % 128 == 0 and rows % 8 == 0


def _normalize_kernel(img_ref, scale_ref, bias_ref, out_ref):
    # uint8 -> f32 must hop through int32 (the Mosaic TPU lowering has no
    # direct unsigned-to-float cast)
    x = img_ref[:].astype(jnp.int32).astype(jnp.float32)
    out_ref[:] = (x * scale_ref[:] + bias_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def normalize_images_pallas(
    images_uint8: jax.Array,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """uint8 images (..., H, W, 3) -> ImageNet-normalized ``out_dtype``.

    Drop-in for ``normalize_images(...).astype(out_dtype)`` on uint8 input;
    numerics match to bf16 rounding (parity-tested in
    tests/ops/test_pallas_preprocess.py).
    """
    shape = images_uint8.shape
    assert pallas_preprocess_supported(shape), shape
    w3 = shape[-2] * 3
    rows = int(np.prod(shape[:-2]))
    flat = images_uint8.reshape(rows, w3)

    mean = np.asarray(IMAGENET_MEAN, dtype=np.float64)
    std = np.asarray(IMAGENET_STD, dtype=np.float64)
    ch = np.arange(w3) % 3
    scale = (1.0 / (255.0 * std[ch])).astype(np.float32)[None]  # (1, W*3)
    bias = (-mean[ch] / std[ch]).astype(np.float32)[None]

    row_block = _ROW_BLOCK if rows % _ROW_BLOCK == 0 else 8
    out = pl.pallas_call(
        _normalize_kernel,
        grid=(rows // row_block,),
        in_specs=[
            pl.BlockSpec((row_block, w3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, w3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, w3), out_dtype),
        interpret=interpret,
    )(flat, jnp.asarray(scale), jnp.asarray(bias))
    return out.reshape(shape)
