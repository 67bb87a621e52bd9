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


def test_multiview_context_batch_trims_bbox(rng):
    """Multiview context batches carry 4 extra bbox rows that must be
    trimmed before the per-view remap (reference test_bboxes.py:248-277)."""
    b, v, k = 3, 2, 3
    kp = rng.uniform(0, 256, size=(b, v * k * 2)).astype(np.float32)
    bbox = np.concatenate(
        [_rand_bbox(rng, b + 4), _rand_bbox(rng, b + 4)], axis=1
    )
    out = np.asarray(
        bboxes.model_to_frame_batch(kp, bbox, 256.0, 256.0, num_views=v)
    )
    expected = np.asarray(
        bboxes.model_to_frame_batch(kp, bbox[2:-2], 256.0, 256.0, num_views=v)
    )
    np.testing.assert_allclose(out, expected)


def test_frame_to_model_batch_multiview(rng):
    b, v, k = 2, 2, 3
    kp = rng.uniform(0, 200, size=(b, v, k, 2)).astype(np.float32)
    bbox = np.concatenate([_rand_bbox(rng, b), _rand_bbox(rng, b)], axis=1)
    out = np.asarray(bboxes.frame_to_model_batch(kp, bbox, 256.0, 256.0))
    assert out.shape == (b, v, k, 2)
    exp0 = np.asarray(bboxes.frame_to_model(kp[:, 0], bbox[:, :4], 256.0, 256.0))
    np.testing.assert_allclose(out[:, 0], exp0, rtol=1e-4)


# --- exact-value cases mirroring reference tests/data/test_bboxes.py ---


def test_frame_to_norm_corners_and_center():
    """Bbox corners and center map to (0,0), (1,1), (0.5,0.5)
    (reference test_bboxes.py:21-40)."""
    for x, y, h, w in [(0.0, 0.0, 100.0, 200.0), (20.0, 30.0, 100.0, 200.0)]:
        kp = np.array(
            [[[x, y]], [[x + w, y + h]], [[x + w / 2, y + h / 2]]],
            dtype=np.float32,
        )
        bbox = np.tile(np.array([[x, y, h, w]], np.float32), (3, 1))
        out = np.asarray(bboxes.frame_to_norm(kp, bbox))
        np.testing.assert_allclose(
            out[:, 0], [[0.0, 0.0], [1.0, 1.0], [0.5, 0.5]], atol=1e-6
        )


def test_frame_to_norm_context_corners_and_center():
    """Context batch (4 extra bbox rows): middle rows govern the transform
    (reference test_bboxes.py:42-62)."""
    x, y, h, w = 20.0, 30.0, 100.0, 200.0
    kp = np.array(
        [[[x, y]], [[x + w, y + h]], [[x + w / 2, y + h / 2]]], dtype=np.float32
    )
    bbox = np.tile(np.array([[x, y, h, w]], np.float32), (7, 1))
    out = np.asarray(bboxes.frame_to_norm(kp, bbox))
    np.testing.assert_allclose(
        out[:, 0], [[0.0, 0.0], [1.0, 1.0], [0.5, 0.5]], atol=1e-6
    )


def test_norm_to_model_corners_and_center():
    """(0,0)/(1,1)/(.5,.5) -> model corners/center for square and
    non-square dims (reference test_bboxes.py:137-155)."""
    kp = np.array([[[0.0, 0.0]], [[1.0, 1.0]], [[0.5, 0.5]]], np.float32)
    for mw, mh in [(256.0, 256.0), (128.0, 64.0)]:
        out = np.asarray(bboxes.norm_to_model(kp, mw, mh))
        np.testing.assert_allclose(
            out[:, 0], [[0.0, 0.0], [mw, mh], [mw / 2, mh / 2]], atol=1e-5
        )


def test_model_to_norm_corners_and_center():
    for mw, mh in [(256.0, 256.0), (128.0, 64.0)]:
        kp = np.array([[[0.0, 0.0]], [[mw, mh]], [[mw / 2, mh / 2]]], np.float32)
        out = np.asarray(bboxes.model_to_norm(kp, mw, mh))
        np.testing.assert_allclose(
            out[:, 0], [[0.0, 0.0], [1.0, 1.0], [0.5, 0.5]], atol=1e-6
        )


def test_frame_to_model_rectangular_dims():
    """Non-square model dims: exact pixel values
    (reference test_bboxes.py:516-551)."""
    kp = np.array(
        [[[50.0, 25.0]], [[150.0, 75.0]], [[100.0, 50.0]]], dtype=np.float32
    )
    bbox = np.tile(np.array([[50.0, 25.0, 50.0, 100.0]], np.float32), (3, 1))
    out = np.asarray(bboxes.frame_to_model(kp, bbox, 128.0, 64.0))
    np.testing.assert_allclose(
        out[:, 0], [[0.0, 0.0], [128.0, 64.0], [64.0, 32.0]], atol=1e-5
    )


def test_model_to_frame_batch_bbox_corners_multiview():
    """Model (0,0) maps to each view's bbox top-left; (mw,mh) to each
    view's bottom-right (reference test_bboxes.py:299-324)."""
    bbox = np.array(
        [
            [5.0, 6.0, 100.0, 101.0, 10.0, 11.0, 102.0, 103.0],
            [0.0, 0.0, 123.0, 124.0, 0.0, 0.0, 3.0, 4.0],
        ],
        dtype=np.float32,
    )
    kp = np.array(
        [[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 10.0, 10.0]], dtype=np.float32
    )
    out = np.asarray(bboxes.model_to_frame_batch(kp, bbox, 10.0, 10.0, num_views=2))
    # batch 0: model origin -> bbox top-left per view
    np.testing.assert_allclose(out[0], [5.0, 6.0, 10.0, 11.0], atol=1e-5)
    # batch 1: model (10,10) = (mw,mh) -> bbox bottom-right per view
    np.testing.assert_allclose(
        out[1],
        [0.0 + 124.0, 0.0 + 123.0, 0.0 + 4.0, 0.0 + 3.0],
        atol=1e-4,
    )


def test_pure_functions_do_not_mutate_input():
    """Functional JAX semantics: inputs never change (the reference
    documents which torch variants mutate; here none do)."""
    kp = np.array([[[10.0, 20.0]], [[210.0, 120.0]]], np.float32)
    bbox = np.tile(np.array([[10.0, 20.0, 100.0, 200.0]], np.float32), (2, 1))
    kp0, bbox0 = kp.copy(), bbox.copy()
    bboxes.frame_to_norm(kp, bbox)
    bboxes.norm_to_frame(kp, bbox)
    bboxes.frame_to_model(kp, bbox, 256.0, 128.0)
    bboxes.model_to_frame(kp, bbox, 256.0, 128.0)
    np.testing.assert_array_equal(kp, kp0)
    np.testing.assert_array_equal(bbox, bbox0)
