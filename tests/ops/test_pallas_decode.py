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


def test_rectangular_decode_matches_sequential_upsample(rng):
    """H != W heatmaps: the per-axis matrix fast path equals the sequential
    2x-upsample chain (non-square image_resize_dims support)."""
    import jax.numpy as jnp

    from lightning_pose_tpu.ops import softargmax as sm

    hm = rng.uniform(0, 1, size=(2, 16, 32, 4)).astype(np.float32)
    hm = hm / hm.sum(axis=(1, 2), keepdims=True)

    kp_fast, conf_fast = sm.run_subpixelmaxima(
        jnp.asarray(hm), downsample_factor=2, temperature=1000.0
    )

    # reference chain: two upsample2x rounds, then softmax/expectation
    up = jnp.asarray(hm)
    for _ in range(2):
        up = sm.upsample2x(up)
    soft = sm.spatial_softmax2d(up, temperature=1000.0)
    preds = sm.spatial_expectation2d(soft)  # normalized coords path inside

    assert kp_fast.shape == (2, 8)
    assert conf_fast.shape == (2, 4)
    # x must span the wider axis: decode on (64, 128) full-res grid
    kp = np.asarray(kp_fast).reshape(2, 4, 2)
    assert kp[..., 0].max() <= 128 and kp[..., 1].max() <= 64
    # matrix path == sequential path (same linear operator)
    up_m = None
    from lightning_pose_tpu.ops.pallas_decode import upsample_matrix

    mh = jnp.asarray(upsample_matrix(16, 2))
    mw = jnp.asarray(upsample_matrix(32, 2))
    up_m = jnp.einsum("ph,bhwk,qw->bpqk", mh, jnp.asarray(hm), mw)
    np.testing.assert_allclose(np.asarray(up_m), np.asarray(up), atol=1e-5)
