"""Round-trip tests for bbox coordinate transforms
(mirroring reference tests/data/test_bboxes.py semantics)."""

import numpy as np

from lightning_pose_tpu.data import bboxes


def _rand_kp(rng, b=3, k=5):
    return rng.uniform(0, 200, size=(b, k, 2)).astype(np.float32)


def _rand_bbox(rng, b=3):
    # [x, y, h, w]
    out = np.zeros((b, 4), dtype=np.float32)
    out[:, 0] = rng.uniform(0, 50, b)
    out[:, 1] = rng.uniform(0, 50, b)
    out[:, 2] = rng.uniform(100, 300, b)
    out[:, 3] = rng.uniform(100, 300, b)
    return out


def test_frame_norm_roundtrip(rng):
    kp = _rand_kp(rng)
    bbox = _rand_bbox(rng)
    norm = bboxes.frame_to_norm(kp, bbox)
    back = np.asarray(bboxes.norm_to_frame(norm, bbox))
    np.testing.assert_allclose(back, kp, rtol=1e-4, atol=1e-3)


def test_model_norm_roundtrip(rng):
    kp = _rand_kp(rng)
    norm = bboxes.model_to_norm(kp, 256.0, 128.0)
    back = np.asarray(bboxes.norm_to_model(norm, 256.0, 128.0))
    np.testing.assert_allclose(back, kp, rtol=1e-5)


def test_frame_model_roundtrip(rng):
    kp = _rand_kp(rng)
    bbox = _rand_bbox(rng)
    model = bboxes.frame_to_model(kp, bbox, 256.0, 256.0)
    back = np.asarray(bboxes.model_to_frame(model, bbox, 256.0, 256.0))
    np.testing.assert_allclose(back, kp, rtol=1e-4, atol=1e-3)


def test_identity_bbox_is_noop(rng):
    """bbox covering the full model image leaves model coords unchanged."""
    kp = _rand_kp(rng)
    bbox = np.tile(np.array([[0.0, 0.0, 256.0, 256.0]], dtype=np.float32), (3, 1))
    out = np.asarray(bboxes.model_to_frame(kp, bbox, 256.0, 256.0))
    np.testing.assert_allclose(out, kp, rtol=1e-5)


def test_context_batch_trims_bbox(rng):
    """Context batches have 4 more bbox rows than keypoint rows
    (reference bboxes.py:64-68)."""
    kp = _rand_kp(rng, b=3)
    bbox = _rand_bbox(rng, b=7)
    out = np.asarray(bboxes.frame_to_norm(kp, bbox))
    expected = np.asarray(bboxes.frame_to_norm(kp, bbox[2:-2]))
    np.testing.assert_allclose(out, expected)


def test_model_to_frame_batch_flat(rng):
    kp_flat = rng.uniform(0, 256, size=(4, 10)).astype(np.float32)  # 5 kps
    bbox = _rand_bbox(rng, b=4)
    out = np.asarray(bboxes.model_to_frame_batch(kp_flat, bbox, 256.0, 256.0))
    assert out.shape == (4, 10)
    # compare against unbatched path
    expected = np.asarray(
        bboxes.model_to_frame(kp_flat.reshape(4, 5, 2), bbox, 256.0, 256.0)
    ).reshape(4, 10)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_multiview_batch(rng):
    """Per-view bbox slices applied to contiguous per-view keypoint blocks."""
    b, v, k = 2, 2, 3
    kp = rng.uniform(0, 256, size=(b, v * k * 2)).astype(np.float32)
    bbox = np.concatenate([_rand_bbox(rng, b), _rand_bbox(rng, b)], axis=1)
    out = np.asarray(
        bboxes.model_to_frame_batch(kp, bbox, 256.0, 256.0, num_views=v)
    )
    # view 0 keypoints use bbox[:, :4]
    kp0 = kp.reshape(b, v * k, 2)[:, :k]
    exp0 = np.asarray(bboxes.model_to_frame(kp0, bbox[:, :4], 256.0, 256.0))
    np.testing.assert_allclose(out.reshape(b, v * k, 2)[:, :k], exp0, rtol=1e-4)
    # view 1 keypoints use bbox[:, 4:]
    kp1 = kp.reshape(b, v * k, 2)[:, k:]
    exp1 = np.asarray(bboxes.model_to_frame(kp1, bbox[:, 4:], 256.0, 256.0))
    np.testing.assert_allclose(out.reshape(b, v * k, 2)[:, k:], exp1, rtol=1e-4)


def test_frame_to_model_batch_multiview(rng):
    b, v, k = 2, 2, 3
    kp = rng.uniform(0, 200, size=(b, v, k, 2)).astype(np.float32)
    bbox = np.concatenate([_rand_bbox(rng, b), _rand_bbox(rng, b)], axis=1)
    out = np.asarray(bboxes.frame_to_model_batch(kp, bbox, 256.0, 256.0))
    assert out.shape == (b, v, k, 2)
    exp0 = np.asarray(bboxes.frame_to_model(kp[:, 0], bbox[:, :4], 256.0, 256.0))
    np.testing.assert_allclose(out[:, 0], exp0, rtol=1e-4)
