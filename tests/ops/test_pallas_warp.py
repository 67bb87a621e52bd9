"""Pallas one-hot-matmul warp vs the reference 4-tap gather
(ops/pallas_warp.py; interpret mode on CPU). Tolerance covers bf16
interpolation-weight rounding on 0-255 pixel data (<1 gray level —
below cv2's own 5-bit fixed-point bilinear quantization)."""

import numpy as np
import pytest

from lightning_pose_tpu.ops.augment import grid_sample_bilinear
from lightning_pose_tpu.ops.pallas_warp import (
    pallas_warp_supported,
    warp_bilinear_pallas,
)


def _affine_coords(b, h, w, theta, jitter=None, rng=None):
    ys, xs = np.meshgrid(
        np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32),
        indexing="ij",
    )
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    px = np.cos(theta) * (xs - cx) - np.sin(theta) * (ys - cy) + cx
    py = np.sin(theta) * (xs - cx) + np.cos(theta) * (ys - cy) + cy
    coords = np.stack([np.stack([px, py], -1)] * b).astype(np.float32)
    if jitter:
        coords = coords + rng.uniform(-jitter, jitter, coords.shape).astype(
            np.float32
        )
    return coords


@pytest.mark.parametrize("h,w,theta", [(128, 128, 0.0), (128, 256, 0.35),
                                       (256, 128, -0.45)])
def test_matches_gather_affine(rng, h, w, theta):
    b = 2
    img = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)
    coords = _affine_coords(b, h, w, theta)
    ref = np.asarray(grid_sample_bilinear(img, coords))
    out = np.asarray(warp_bilinear_pallas(img, coords, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1.5)
    # rotation pushes corners out of frame: zero-pad semantics must agree
    if theta:
        assert (ref == 0).any()
        np.testing.assert_array_equal(out[ref == 0] == 0, ref[ref == 0] == 0)


def test_matches_gather_elastic_coords(rng):
    """Arbitrary smooth per-pixel coords (the fused affine+elastic grid)."""
    b, h, w = 2, 128, 128
    img = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)
    coords = _affine_coords(b, h, w, 0.2, jitter=8.0, rng=rng)
    ref = np.asarray(grid_sample_bilinear(img, coords))
    out = np.asarray(warp_bilinear_pallas(img, coords, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1.5)


def test_identity_warp_is_near_exact(rng):
    """Integer positions have exact one-hot weights: identity warp returns
    the image to bf16-value rounding (<=0.5 gray at 255)."""
    b, h, w = 1, 128, 128
    img = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)
    coords = _affine_coords(b, h, w, 0.0)
    out = np.asarray(warp_bilinear_pallas(img, coords, interpret=True))
    np.testing.assert_allclose(out, img, atol=1.0)


@pytest.mark.parametrize("theta,jitter", [(0.35, None), (0.2, 8.0), (0.0, 4.0)])
def test_windowed_matches_full(rng, theta, jitter):
    """With a valid row_span_bound the windowed contraction is exactly the
    full kernel: the dynamic row window covers every in-frame tap of each
    tile (rotation pushes corner tiles' windows against the clamp edges)."""
    b, h, w = 2, 256, 256
    img = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)
    coords = _affine_coords(b, h, w, theta, jitter=jitter, rng=rng)
    # span over an (8, 128) tile: |sin|*127 + |cos|*7 (+ 2*jitter)
    bound = abs(np.sin(theta)) * 127 + abs(np.cos(theta)) * 7
    if jitter:
        bound += 2 * jitter
    full = np.asarray(warp_bilinear_pallas(img, coords, interpret=True))
    windowed = np.asarray(
        warp_bilinear_pallas(
            img, coords, row_span_bound=bound, interpret=True
        )
    )
    from lightning_pose_tpu.ops.pallas_warp import row_window_size

    assert row_window_size(bound, h) < h  # the window actually engages
    np.testing.assert_array_equal(windowed, full)


def test_row_window_size():
    from lightning_pose_tpu.ops.pallas_warp import row_window_size

    assert row_window_size(None, 256) == 256
    assert row_window_size(98.9, 256) == 112  # dlc preset @ 256px
    assert row_window_size(300.0, 256) == 256  # bound >= H: full window
    assert row_window_size(0.0, 256) == 16


def test_dlc_span_bound_engages_window():
    """The dlc preset's static span bound leaves real headroom at 256px."""
    from lightning_pose_tpu.ops.augment import (
        _warp_row_span_bound,
        build_spec,
    )
    from lightning_pose_tpu.ops.pallas_warp import row_window_size

    spec = build_spec("dlc")
    bound = _warp_row_span_bound(spec, hflip=False)
    assert bound is not None
    assert row_window_size(bound, 256) <= 128
    # odd-k rot90 (dlc-top-down) transposes axes: window ~ full height
    spec_td = build_spec("dlc-top-down")
    bound_td = _warp_row_span_bound(spec_td, hflip=False)
    assert row_window_size(bound_td, 256) == 208  # 1.3*(127+7)+20 -> 208
    # no geometric ops (dlc-mv is photometric-only) -> no bound needed
    assert _warp_row_span_bound(build_spec("dlc-mv"), hflip=False) is None
    assert _warp_row_span_bound(build_spec(None), hflip=False) is None


def test_supported_predicate():
    assert pallas_warp_supported((4, 256, 256, 3), (4, 256, 256, 2))
    assert pallas_warp_supported((4, 128, 384, 3), (4, 128, 384, 2))
    # unaligned dims, wrong channel count, resized output -> gather fallback
    assert not pallas_warp_supported((4, 250, 256, 3), (4, 250, 256, 2))
    assert not pallas_warp_supported((4, 256, 256, 1), (4, 256, 256, 2))
    assert not pallas_warp_supported((4, 256, 256, 3), (4, 128, 128, 2))


def test_video_augment_span_bound(rng):
    """The unlabeled-stream augmentation's static span bound (rot +-10deg,
    scale >=0.8, ops/video_augment.py) engages the window and reproduces
    the full contraction exactly at its worst-case geometry."""
    from lightning_pose_tpu.ops.pallas_warp import row_window_size
    from lightning_pose_tpu.ops.video_augment import _SPAN_BOUND

    b, h, w = 2, 256, 256
    assert row_window_size(_SPAN_BOUND, h) <= 48
    img = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)
    # worst case: max rotation with the most magnifying inverse (scale_lo)
    theta = np.deg2rad(10.0)
    coords = _affine_coords(b, h, w, theta) / 0.8
    full = np.asarray(warp_bilinear_pallas(img, coords, interpret=True))
    windowed = np.asarray(warp_bilinear_pallas(
        img, coords, row_span_bound=_SPAN_BOUND, interpret=True))
    np.testing.assert_array_equal(windowed, full)


def test_span_bound_rejects_unmodeled_affine_keys():
    """The bound models rotation-only affines; an extended spec (e.g.
    imgaug-style scale/shear) must fail loudly rather than silently
    under-covering the windowed kernel (ADVICE r4)."""
    import pytest

    from lightning_pose_tpu.ops.augment import (
        _warp_row_span_bound,
        build_spec,
    )

    spec = build_spec("dlc")
    spec["affine"] = dict(spec["affine"], scale=(0.5, 1.5))
    with pytest.raises(NotImplementedError, match="scale"):
        _warp_row_span_bound(spec, hflip=False)

    spec2 = build_spec("dlc")
    spec2["elastic"] = dict(spec2["elastic"], order=3)
    with pytest.raises(NotImplementedError, match="order"):
        _warp_row_span_bound(spec2, hflip=False)
