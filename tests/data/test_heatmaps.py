"""Tests for Gaussian heatmap generation/evaluation (golden-value checks
mirroring reference tests/data/test_heatmaps.py semantics)."""

import numpy as np
import pytest

from lightning_pose_tpu.data.heatmaps import (
    evaluate_heatmaps_at_location,
    generate_heatmaps,
)


def _golden_heatmap(x, y, out_h, out_w, in_h, in_w, sigma=1.25):
    """Independent numpy implementation of the reference math
    (reference data/heatmaps.py:41-74)."""
    xs = x * out_w / in_w
    ys = y * out_h / in_h
    xs = np.clip(xs, -1, out_w + 1)
    ys = np.clip(ys, -1, out_h + 1)
    yy, xx = np.meshgrid(np.arange(out_h), np.arange(out_w), indexing="ij")
    hm = np.exp(-((yy - ys) ** 2 + (xx - xs) ** 2) / (2 * sigma**2))
    return hm / hm.sum()


def test_generate_heatmaps_matches_golden():
    kps = np.array([[[100.0, 50.0], [30.5, 200.25]]], dtype=np.float32)
    hms = np.asarray(generate_heatmaps(kps, height=256, width=256, output_shape=(64, 64)))
    assert hms.shape == (1, 64, 64, 2)
    for k in range(2):
        golden = _golden_heatmap(kps[0, k, 0], kps[0, k, 1], 64, 64, 256, 256)
        np.testing.assert_allclose(hms[0, :, :, k], golden, atol=1e-6)


def test_generate_heatmaps_sum_to_one():
    rng = np.random.default_rng(1)
    kps = rng.uniform(10, 240, size=(4, 5, 2)).astype(np.float32)
    hms = np.asarray(generate_heatmaps(kps, 256, 256, (64, 64)))
    np.testing.assert_allclose(hms.sum(axis=(1, 2)), 1.0, atol=1e-5)


def test_generate_heatmaps_nan_gives_zero():
    kps = np.array([[[np.nan, 50.0], [100.0, 100.0]]], dtype=np.float32)
    hms = np.asarray(generate_heatmaps(kps, 256, 256, (64, 64)))
    assert hms[0, :, :, 0].sum() == 0.0
    assert hms[0, :, :, 1].sum() == pytest.approx(1.0, abs=1e-5)


def test_generate_heatmaps_out_of_bounds_gives_zero():
    kps = np.array([[[-100.0, 50.0], [100.0, 5000.0]]], dtype=np.float32)
    hms = np.asarray(generate_heatmaps(kps, 256, 256, (64, 64)))
    assert hms.sum() == 0.0


def test_generate_heatmaps_visibility_semantics():
    """0 -> zero map, 1 -> uniform, 2 -> gaussian (reference heatmaps.py:80-86)."""
    kps = np.tile(np.array([[[100.0, 100.0]]], dtype=np.float32), (1, 3, 1))
    vis = np.array([[0, 1, 2]])
    hms = np.asarray(generate_heatmaps(kps, 256, 256, (64, 64), visibility=vis))
    assert hms[0, :, :, 0].sum() == 0.0
    np.testing.assert_allclose(hms[0, :, :, 1], 1.0 / (64 * 64), atol=1e-8)
    assert hms[0, :, :, 2].max() > 1.0 / (64 * 64)
    # visible but NaN -> zero
    kps2 = np.array([[[np.nan, 1.0]]], dtype=np.float32)
    hms2 = np.asarray(generate_heatmaps(kps2, 256, 256, (64, 64), visibility=np.array([[2]])))
    assert hms2.sum() == 0.0


def test_evaluate_heatmaps_at_location_window_sum():
    """Confidence = 5x5 window sum around truncated-int location."""
    hm = np.zeros((1, 64, 64, 1), dtype=np.float32)
    hm[0, 30:33, 40:43, 0] = 1.0 / 9  # mass near (x=41, y=31)
    locs = np.array([[[41.4, 31.7]]], dtype=np.float32)
    conf = np.asarray(evaluate_heatmaps_at_location(hm, locs))
    assert conf.shape == (1, 1)
    assert conf[0, 0] == pytest.approx(1.0, abs=1e-6)
    # far away location -> zero
    locs2 = np.array([[[5.0, 5.0]]], dtype=np.float32)
    conf2 = np.asarray(evaluate_heatmaps_at_location(hm, locs2))
    assert conf2[0, 0] == 0.0


def test_evaluate_heatmaps_edge_location():
    hm = np.zeros((1, 64, 64, 1), dtype=np.float32)
    hm[0, 0, 0, 0] = 1.0
    locs = np.array([[[0.0, 0.0]]], dtype=np.float32)
    conf = np.asarray(evaluate_heatmaps_at_location(hm, locs))
    assert conf[0, 0] == pytest.approx(1.0, abs=1e-6)


def test_evaluate_heatmaps_on_generated_gaussian():
    """A clean generated gaussian should have confidence near 1 at its peak."""
    kps = np.array([[[128.0, 128.0]]], dtype=np.float32)
    hms = generate_heatmaps(kps, 256, 256, (64, 64))
    locs = np.array([[[32.0, 32.0]]], dtype=np.float32)
    conf = np.asarray(evaluate_heatmaps_at_location(hms, locs))
    # a sigma=1.25 gaussian holds ~92% of its mass in a 5x5 window
    assert conf[0, 0] > 0.9


def test_generate_heatmaps_rectangular_output():
    """Non-square image/heatmap dims scale each axis independently
    (reference tests/data/test_heatmaps.py:96 'weird shape')."""
    kps = np.array([[[100.0, 50.0]]], dtype=np.float32)  # (x, y) in 256x128-w
    hms = np.asarray(
        generate_heatmaps(kps, height=256, width=128, output_shape=(64, 32))
    )
    assert hms.shape == (1, 64, 32, 1)
    peak = np.unravel_index(np.argmax(hms[0, :, :, 0]), (64, 32))
    # x scales by 32/128, y by 64/256
    assert abs(peak[1] - 100.0 * 32 / 128) <= 1
    assert abs(peak[0] - 50.0 * 64 / 256) <= 1
    assert hms.sum() == pytest.approx(1.0, abs=1e-5)


def test_evaluate_heatmaps_rectangular():
    hm = np.zeros((1, 64, 32, 1), dtype=np.float32)
    hm[0, 12, 25, 0] = 1.0
    conf = np.asarray(
        evaluate_heatmaps_at_location(hm, np.array([[[25.0, 12.0]]], np.float32))
    )
    assert conf[0, 0] == pytest.approx(1.0, abs=1e-6)


def test_generate_heatmaps_gradient_flow():
    """Gradients flow through keypoints, finite and non-zero for valid
    keypoints (reference test_heatmaps.py:147 'keep_gradients'; JAX is
    always differentiable, the torch detach flag has no analog)."""
    import jax
    import jax.numpy as jnp

    kps = jnp.array(
        [
            [[32.0, 64.0], [128.0, 96.0], [200.0, 150.0], [100.0, 200.0]],
            [[64.0, 32.0], [160.0, 120.0], [180.0, 180.0], [120.0, 220.0]],
        ]
    )

    def loss(k):
        hm = generate_heatmaps(k, 256, 256, (64, 64))
        # sum() alone is ~constant under normalization; weight by position
        w = jnp.arange(64, dtype=jnp.float32)
        return jnp.sum(hm * w[None, :, None, None])

    g = np.asarray(jax.grad(loss)(kps))
    assert np.isfinite(g).all()
    assert (g != 0).any()


def test_generate_heatmaps_extreme_oob_finite_gradients():
    """Extreme (1e8) out-of-bounds coordinates: zero heatmaps, finite
    gradients (reference test_heatmaps.py:284 'extreme clamping')."""
    import jax
    import jax.numpy as jnp

    kps = jnp.array(
        [[[-1e8, 32.0], [1e8, 32.0], [32.0, -1e8], [32.0, 1e8]]]
    )
    hms = np.asarray(generate_heatmaps(kps, 256, 256, (64, 64)))
    assert np.isfinite(hms).all()
    assert hms.sum() == 0.0  # all four are OOB -> zero maps
    g = np.asarray(jax.grad(lambda k: jnp.sum(generate_heatmaps(k, 256, 256, (64, 64))))(kps))
    assert np.isfinite(g).all()


def test_generate_heatmaps_oob_visibility_matrix():
    """OOB/NaN x visibility interactions (reference test_heatmaps.py:203):
    vis=1 -> uniform even when OOB/NaN; vis=0 -> zero even when valid;
    vis=2 + OOB/NaN -> zero (defensive); vis=2 + valid -> Gaussian."""
    oh, ow = 64, 64
    uniform = 1.0 / (oh * ow)
    kps = np.array(
        [
            [
                [32.0, 32.0],  # valid
                [-10.0, 50.0],  # x OOB
                [500.0, 32.0],  # x OOB high
                [32.0, 500.0],  # y OOB high
            ],
            [
                [32.0, -10.0],  # y OOB
                [64.0, 64.0],  # valid
                [np.nan, 32.0],  # explicit NaN
                [128.0, 128.0],  # valid
            ],
        ],
        dtype=np.float32,
    )

    # visibility=None: OOB/NaN -> zeros, valid -> Gaussian
    hms = np.asarray(generate_heatmaps(kps, 256, 256, (oh, ow)))
    for b, k in [(0, 1), (0, 2), (0, 3), (1, 0), (1, 2)]:
        assert hms[b, :, :, k].sum() == 0.0, (b, k)
    for b, k in [(0, 0), (1, 1), (1, 3)]:
        assert hms[b, :, :, k].sum() == pytest.approx(1.0, abs=1e-5), (b, k)

    # vis=1: uniform regardless of OOB/NaN
    hms1 = np.asarray(
        generate_heatmaps(kps, 256, 256, (oh, ow), visibility=np.ones((2, 4), int))
    )
    np.testing.assert_allclose(hms1, uniform, atol=1e-8)

    # vis=0: zero regardless of validity
    hms0 = np.asarray(
        generate_heatmaps(kps, 256, 256, (oh, ow), visibility=np.zeros((2, 4), int))
    )
    assert hms0.sum() == 0.0

    # vis=2: OOB/NaN -> zero despite the "visible" flag; valid -> Gaussian
    hms2 = np.asarray(
        generate_heatmaps(kps, 256, 256, (oh, ow), visibility=np.full((2, 4), 2))
    )
    assert hms2[0, :, :, 1].sum() == 0.0
    assert hms2[1, :, :, 2].sum() == 0.0
    assert hms2[0, :, :, 0].sum() == pytest.approx(1.0, abs=1e-5)


def test_evaluate_heatmaps_delta_locations():
    """Delta heatmap: conf 1 at the exact and adjacent location, 0 far
    away (reference test_heatmaps.py:457)."""
    hm = np.zeros((1, 32, 32, 1), dtype=np.float32)
    hm[0, 5, 5, 0] = 1.0
    exact = np.asarray(evaluate_heatmaps_at_location(hm, np.array([[[5.0, 5.0]]], np.float32)))
    assert exact.shape == (1, 1)
    assert exact[0, 0] == pytest.approx(1.0, abs=1e-6)
    adjacent = np.asarray(evaluate_heatmaps_at_location(hm, np.array([[[6.0, 6.0]]], np.float32)))
    assert adjacent[0, 0] == pytest.approx(1.0, abs=1e-6)
    wrong = np.asarray(evaluate_heatmaps_at_location(hm, np.array([[[25.0, 25.0]]], np.float32)))
    assert wrong[0, 0] == 0.0


def test_evaluate_heatmaps_gaussian_ordering():
    """On a generated Gaussian: conf(peak) in (0, 1], conf(peak) >
    conf(adjacent), conf(far) == 0 (reference test_heatmaps.py:540-563)."""
    locs0 = np.array([[[5.0, 5.0]]], np.float32)
    hm = generate_heatmaps(locs0, 32, 32, (32, 32))
    c0 = float(np.asarray(evaluate_heatmaps_at_location(hm, locs0))[0, 0])
    c1 = float(
        np.asarray(
            evaluate_heatmaps_at_location(hm, np.array([[[6.0, 6.0]]], np.float32))
        )[0, 0]
    )
    c2 = float(
        np.asarray(
            evaluate_heatmaps_at_location(hm, np.array([[[25.0, 25.0]]], np.float32))
        )[0, 0]
    )
    assert 0.0 < c0 <= 1.0
    assert c0 > c1
    assert c2 == pytest.approx(0.0, abs=1e-7)


@pytest.mark.parametrize("n_batch", [1, 5])
@pytest.mark.parametrize("n_keypoints", [1, 6])
def test_evaluate_heatmaps_spread_mass_sums(n_batch, n_keypoints):
    """Mass spread over the 5x5 window (clamped at edges) still sums to 1
    for any batch/keypoint count (reference test_heatmaps.py:462-500)."""
    rng = np.random.default_rng(7)
    height, width = 24, 12
    hm = np.zeros((n_batch, height, width, n_keypoints), dtype=np.float32)
    ys = rng.integers(0, height, (n_batch, n_keypoints))
    xs = rng.integers(0, width, (n_batch, n_keypoints))
    for i in range(n_batch):
        for j in range(n_keypoints):
            for dy, dx in [(1, 1), (-1, -1), (0, 0), (1, -1), (-1, 1)]:
                yy = np.clip(ys[i, j] + dy, 0, height - 1)
                xx = np.clip(xs[i, j] + dx, 0, width - 1)
                hm[i, yy, xx, j] += 0.2
    locs = np.stack([xs, ys], axis=2).astype(np.float32)
    vals = np.asarray(evaluate_heatmaps_at_location(hm, locs))
    np.testing.assert_allclose(vals, 1.0, atol=1e-6)
