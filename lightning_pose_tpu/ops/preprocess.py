"""On-device image preprocessing: uint8 -> normalized float, batched.

The reference normalizes per-sample on CPU dataloader workers
(torchvision ToTensor + ImageNet Normalize, reference
lightning_pose/data/datasets.py:140-145); here batches of uint8 pixels move
to the device and one fused op does /255 + mean/std normalization (and for
video, resize) — HBM-friendly and fully overlapped with compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "normalize_images",
    "normalize_images_fused",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(images: jax.Array) -> jax.Array:
    """uint8/float pixel images (..., H, W, 3) -> ImageNet-normalized float32."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    return (x - mean) / std


def normalize_images_fused(images: jax.Array, out_dtype=None) -> jax.Array:
    """Normalize with the fused Pallas kernel when profitable.

    On TPU with uint8 input and an aligned shape, one VMEM pass reads uint8
    and writes ``out_dtype`` directly (half the HBM write traffic of the
    f32 XLA path when the backbone computes in bf16); otherwise falls back
    to :func:`normalize_images` + cast.
    """
    if out_dtype is None:
        out_dtype = jnp.float32
    if (
        images.dtype == jnp.uint8
        and jax.default_backend() == "tpu"
    ):
        from lightning_pose_tpu.ops.pallas_preprocess import (
            normalize_images_pallas,
            pallas_preprocess_supported,
        )

        if pallas_preprocess_supported(images.shape):
            return normalize_images_pallas(images, out_dtype=out_dtype)
    return normalize_images(images).astype(out_dtype)
