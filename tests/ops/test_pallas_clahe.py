"""Fused Pallas CLAHE LUT blend (ops/pallas_clahe.py; interpret mode on
CPU) vs a direct NumPy four-corner blend and vs the XLA half-block path in
ops/augment.py. Kernel LUTs ride f32, the XLA path's bf16 corner LUTs
round by <=0.5 gray, so the cross-path tolerance is 1 gray."""

import jax.numpy as jnp
import numpy as np
import pytest

from lightning_pose_tpu.ops.augment import (
    _clahe_lut_grid,
    _equalize_clahe_tiled,
)
from lightning_pose_tpu.ops.pallas_clahe import (
    clahe_apply_pallas,
    pallas_clahe_supported,
)


def _numpy_blend(x, lut_grid, g, h, w, rows):
    """Direct per-pixel four-corner bilinear LUT blend (cv2 semantics) for
    the given image rows; ``x`` is (N, len(rows), W)."""
    n = x.shape[0]
    th, tw = h // g, w // g
    out = np.zeros_like(x, dtype=np.float64)
    wy = np.mod((np.arange(h) + 0.5) / th - 0.5, 1.0)
    wx = np.mod((np.arange(w) + 0.5) / tw - 0.5, 1.0)
    rr = np.arange(h) // (th // 2)  # half-block row per pixel row
    cc = np.arange(w) // (tw // 2)
    ylo = np.clip((rr - 1) // 2, 0, g - 1)
    yhi = np.clip((rr - 1) // 2 + 1, 0, g - 1)
    xlo = np.clip((cc - 1) // 2, 0, g - 1)
    xhi = np.clip((cc - 1) // 2 + 1, 0, g - 1)
    v = np.clip(x, 0, 255).astype(np.int64)
    for i in range(n):
        lut = lut_grid[i]
        for j, y in enumerate(rows):
            for xc in range(w):
                val = v[i, j, xc]
                a = (1 - wx[xc]) * lut[ylo[y], xlo[xc], val] \
                    + wx[xc] * lut[ylo[y], xhi[xc], val]
                bb = (1 - wx[xc]) * lut[yhi[y], xlo[xc], val] \
                    + wx[xc] * lut[yhi[y], xhi[xc], val]
                out[i, j, xc] = (1 - wy[y]) * a + wy[y] * bb
    return out


@pytest.mark.parametrize("h,w,g", [(256, 256, 16), (256, 384, 16)])
def test_matches_numpy_blend(rng, h, w, g):
    assert pallas_clahe_supported(h, w, g)
    n = 2
    x = rng.uniform(0, 255, (n, h, w)).astype(np.float32)
    lut_grid = rng.uniform(0, 255, (n, g, g, 256)).astype(np.float32)
    out = np.asarray(clahe_apply_pallas(x, jnp.asarray(lut_grid), g,
                                        interpret=True))
    # spot-check a row subset (the NumPy blend is python loops)
    rows = np.arange(0, h, 13)
    ref = _numpy_blend(x[:, rows], lut_grid, g, h, w, rows)
    np.testing.assert_allclose(out[:, rows], ref, atol=1e-2)


def test_matches_xla_halfblock_path(rng):
    """End-to-end: kernel blend vs the XLA corner form on real LUTs."""
    b, h, w, c, g = 2, 256, 256, 3, 16
    images = rng.uniform(0, 255, (b, h, w, c)).astype(np.float32)
    clip = np.asarray([2.0, 6.0], dtype=np.float32)
    # XLA path (default_backend is cpu under the test suite)
    ref = np.asarray(_equalize_clahe_tiled(jnp.asarray(images),
                                           jnp.asarray(clip), grid=g))
    x = jnp.asarray(images).transpose(0, 3, 1, 2).astype(jnp.int32)
    lut_grid = _clahe_lut_grid(x, jnp.asarray(clip), g)
    out = clahe_apply_pallas(
        jnp.asarray(x.reshape(b * c, h, w), dtype=jnp.float32),
        lut_grid.reshape(b * c, g, g, 256), g, interpret=True,
    )
    out = np.asarray(out).reshape(b, c, h, w).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=1.0)


def test_unsupported_dims():
    # 384px with g=16 -> half-block rows of 12: not sublane-aligned
    assert not pallas_clahe_supported(384, 256, 16)
    assert not pallas_clahe_supported(256, 250, 16)
    assert not pallas_clahe_supported(256, 256, 1)
