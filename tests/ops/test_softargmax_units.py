"""Direct unit tests for the soft-argmax building blocks (the decode
pipeline is covered end-to-end by test_decode_torch_parity)."""

import numpy as np
import pytest

from lightning_pose_tpu.ops.softargmax import (
    spatial_expectation2d,
    spatial_softmax2d,
    upsample2x,
)


def test_spatial_softmax_normalizes_and_sharpens():
    rng = np.random.default_rng(0)
    hm = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    soft = np.asarray(spatial_softmax2d(hm, temperature=1.0))
    np.testing.assert_allclose(soft.sum(axis=(1, 2)), 1.0, atol=1e-5)
    sharp = np.asarray(spatial_softmax2d(hm, temperature=100.0))
    # higher temperature concentrates mass at the max
    assert sharp.max() > soft.max()


def test_spatial_expectation_on_delta():
    hm = np.zeros((1, 32, 32, 1), dtype=np.float32)
    hm[0, 7, 21, 0] = 1.0
    out = np.asarray(spatial_expectation2d(hm))
    np.testing.assert_allclose(out[0, 0], [21.0, 7.0], atol=1e-5)


def test_upsample2x_matches_torch_pipeline():
    """2x bicubic + pyramid blur tracks the reference's torch sequence.

    jax.image.resize uses the Keys bicubic kernel (a=-0.5) while torch's
    bicubic uses a=-0.75, so per-pixel values differ by up to ~0.02 on
    [0, 1] maps; the end-to-end decode effect is bounded separately at
    <0.5 px keypoint / <0.02 confidence (test_decode_torch_parity)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    hm = rng.random((1, 8, 8, 2)).astype(np.float32)
    ours = np.asarray(upsample2x(hm))

    t = torch.from_numpy(hm).permute(0, 3, 1, 2)
    up = F.interpolate(t, scale_factor=2, mode="bicubic", align_corners=False)
    k1 = torch.tensor([1.0, 4.0, 6.0, 4.0, 1.0])
    kernel = torch.outer(k1, k1) / 256.0
    kernel = kernel.expand(2, 1, 5, 5)
    blurred = F.conv2d(up, kernel, padding=2, groups=2)
    theirs = blurred.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=0.03)


def test_upsample2x_preserves_mass_in_interior():
    """An interior gaussian's mass scales by ~4 (2x per axis) under the
    normalized upsample+blur chain."""
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    g = np.exp(-((yy - 8.0) ** 2 + (xx - 8.0) ** 2) / (2 * 1.25**2))
    g = (g / g.sum()).astype(np.float32)[None, :, :, None]
    up = np.asarray(upsample2x(g))
    assert up.shape == (1, 32, 32, 1)
    assert up.sum() == pytest.approx(4.0, rel=0.02)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("out_hw", [(16, 16), (32, 16), (24, 40)])
def test_bicubic_resize_matches_torch(align_corners, out_hw):
    """ops/interpolate.bicubic_resize_2d is torch-exact (a=-0.75 cubic,
    no antialias) for upsampling, including rectangular outputs."""
    import torch
    import torch.nn.functional as F

    from lightning_pose_tpu.ops.interpolate import bicubic_resize_2d

    rng = np.random.default_rng(2)
    x = rng.random((2, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(bicubic_resize_2d(x, out_hw, align_corners=align_corners))
    theirs = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw, mode="bicubic", align_corners=align_corners,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-4)
