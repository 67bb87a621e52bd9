"""Parity tests for the fused uint8 -> normalized-bf16 Pallas kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from lightning_pose_tpu.ops.pallas_preprocess import (
    normalize_images_pallas,
    pallas_preprocess_supported,
)
from lightning_pose_tpu.ops.preprocess import normalize_images


@pytest.mark.parametrize("shape", [(4, 128, 128, 3), (2, 5, 64, 128, 3),
                                   (8, 96, 256, 3)])
def test_matches_xla_normalize(shape, rng):
    imgs = rng.integers(0, 256, size=shape).astype(np.uint8)
    ref = np.asarray(normalize_images(jnp.asarray(imgs))).astype(np.float32)
    out = np.asarray(
        normalize_images_pallas(jnp.asarray(imgs), interpret=True)
    ).astype(np.float32)
    assert out.shape == ref.shape
    assert out.dtype == np.float32
    # bf16 has ~3 decimal digits; normalized values are in ~[-2.7, 2.7]
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_fp32_output_exact(rng):
    imgs = rng.integers(0, 256, size=(2, 128, 128, 3)).astype(np.uint8)
    ref = np.asarray(normalize_images(jnp.asarray(imgs)))
    out = np.asarray(
        normalize_images_pallas(jnp.asarray(imgs), out_dtype=jnp.float32,
                                interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_supported_predicate():
    assert pallas_preprocess_supported((4, 128, 128, 3))
    assert pallas_preprocess_supported((16, 256, 256, 3))
    assert not pallas_preprocess_supported((4, 128, 100, 3))  # 300 % 128 != 0
    assert not pallas_preprocess_supported((4, 128, 128, 1))
    assert not pallas_preprocess_supported((3, 3))
