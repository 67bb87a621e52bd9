"""Parity test: Pallas fused decode vs the XLA reference path."""

import numpy as np
import pytest

from lightning_pose_tpu.data.heatmaps import generate_heatmaps
from lightning_pose_tpu.ops.pallas_decode import (
    run_subpixelmaxima_pallas,
    upsample_matrix,
)
from lightning_pose_tpu.ops.softargmax import run_subpixelmaxima, upsample2x


def test_upsample_matrix_matches_op(rng):
    """M @ hm @ M^T equals two rounds of upsample2x."""
    import jax.numpy as jnp

    hm = rng.uniform(0, 1, size=(1, 16, 16, 1)).astype(np.float32)
    ref = np.asarray(upsample2x(upsample2x(jnp.asarray(hm))))[0, :, :, 0]
    m = upsample_matrix(16, 2)
    ours = m @ hm[0, :, :, 0] @ m.T
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("df", [1, 2])
def test_pallas_decode_matches_xla(rng, df):
    kps = rng.uniform(10, 110, size=(2, 3, 2)).astype(np.float32)
    hm = np.asarray(generate_heatmaps(kps, 128, 128, (32, 32)))
    kp_ref, conf_ref = run_subpixelmaxima(hm, downsample_factor=df)
    kp_pal, conf_pal = run_subpixelmaxima_pallas(
        hm, downsample_factor=df, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(kp_pal), np.asarray(kp_ref), atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(conf_pal), np.asarray(conf_ref), atol=1e-3
    )


@pytest.mark.parametrize("k,hw,df", [(1, 16, 2), (5, 64, 2), (3, 32, 3)])
def test_pallas_decode_shapes_and_parity(rng, k, hw, df):
    """Kernel handles arbitrary keypoint counts, map sizes, and df=3."""
    size = hw * (2**df)
    kps = rng.uniform(size * 0.1, size * 0.9, size=(2, k, 2)).astype(np.float32)
    hm = np.asarray(generate_heatmaps(kps, size, size, (hw, hw)))
    kp_ref, conf_ref = run_subpixelmaxima(hm, downsample_factor=df)
    kp_pal, conf_pal = run_subpixelmaxima_pallas(
        hm, downsample_factor=df, interpret=True
    )
    assert kp_pal.shape == (2, 2 * k)
    np.testing.assert_allclose(np.asarray(kp_pal), np.asarray(kp_ref), atol=0.1)
    np.testing.assert_allclose(np.asarray(conf_pal), np.asarray(conf_ref), atol=5e-3)
