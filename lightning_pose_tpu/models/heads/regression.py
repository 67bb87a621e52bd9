"""Linear regression head: pooled features -> 2K coordinates
(reference lightning_pose/models/heads/regression.py:11-43)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["LinearRegressionHead"]


class LinearRegressionHead(nn.Module):
    """Adaptive-average-pooled features -> Linear -> (x, y) coordinates."""

    num_targets: int  # 2 * num_keypoints
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jax.Array) -> jax.Array:
        """features ``(B, C)`` or ``(B, h, w, C)`` -> ``(B, num_targets)``."""
        if features.ndim == 4:
            features = jnp.mean(features, axis=(1, 2))
        out = nn.Dense(self.num_targets, dtype=self.dtype, name="linear")(features)
        return out.astype(jnp.float32)
