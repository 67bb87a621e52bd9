"""Tests for the native C++ frame-ops library (cv2 parity)."""

import numpy as np
import pytest

from lightning_pose_tpu import native


def test_native_builds_and_loads():
    assert native.available(), "native frame-ops library failed to build"
    lib = native.get_lib()
    assert lib.frame_ops_version() >= 2


def test_batch_resize_matches_cv2(rng):
    import cv2

    frames = rng.integers(0, 255, size=(3, 60, 80, 3)).astype(np.uint8)
    out = native.batch_resize_rgb(frames, 32, 40)
    assert out.shape == (3, 32, 40, 3)
    ref = np.stack(
        [cv2.resize(f, (40, 32), interpolation=cv2.INTER_LINEAR) for f in frames]
    )
    # identical half-pixel bilinear math up to rounding
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_batch_resize_swap_rb(rng):
    frames = rng.integers(0, 255, size=(1, 16, 16, 3)).astype(np.uint8)
    out = native.batch_resize_rgb(frames, 16, 16, swap_rb=True)
    np.testing.assert_array_equal(out[0, :, :, 0], frames[0, :, :, 2])
    np.testing.assert_array_equal(out[0, :, :, 2], frames[0, :, :, 0])


def test_crop_resize(rng):
    frames = rng.integers(1, 255, size=(2, 40, 40, 3)).astype(np.uint8)
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    bboxes = np.array([[10, 10, 20, 20], [-5, -5, 20, 20]], dtype=np.int32)
    out = np.empty((2, 20, 20, 3), dtype=np.uint8)
    lib.batch_crop_resize_rgb(
        np.ascontiguousarray(frames).ctypes.data, 2, 40, 40,
        bboxes.ctypes.data, out.ctypes.data, 20, 20, 0, 1,
    )
    # in-bounds crop at 1:1 scale equals the source region
    np.testing.assert_array_equal(out[0], frames[0, 10:30, 10:30])
    # out-of-bounds region zero-padded top-left
    assert (out[1, :4, :4] == 0).all()


def test_batch_rgb_to_i420_matches_cv2():
    """Native I420 conversion matches cv2.COLOR_RGB2YUV_I420 to rounding
    (+-2) including the top-left-of-2x2 chroma subsampling."""
    import cv2

    from lightning_pose_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 32, 48, 3), dtype=np.uint8)
    ours = native.batch_rgb_to_i420(frames)
    golden = np.stack(
        [cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in frames]
    )
    assert ours.shape == golden.shape == (3, 48, 48)
    diff = np.abs(ours.astype(int) - golden.astype(int))
    assert diff.max() <= 2
