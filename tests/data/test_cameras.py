"""Tests for JAX camera geometry + 3D augmentation."""

import numpy as np
import pytest

from lightning_pose_tpu.data import cameras


def _synthetic_rig(n_views=3):
    """Cameras on a circle looking at the origin."""
    intr, extr = [], []
    for i in range(n_views):
        angle = 2 * np.pi * i / n_views * 0.2
        k = np.array([[500.0, 0, 200], [0, 500.0, 200], [0, 0, 1]], np.float32)
        c, s = np.cos(angle), np.sin(angle)
        r = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t = np.array([0.1 * i, 0.0, 5.0], np.float32)
        intr.append(k)
        extr.append(np.concatenate([r, t[:, None]], axis=1).astype(np.float32))
    dist = np.zeros((n_views, 5), np.float32)
    return np.stack(intr), np.stack(extr), dist


def _project(pts3d, intr, extr):
    homog = np.concatenate([pts3d, np.ones_like(pts3d[:, :1])], axis=1)
    cam = homog @ extr.T
    xy = cam[:, :2] / cam[:, 2:3]
    return xy * [intr[0, 0], intr[1, 1]] + [intr[0, 2], intr[1, 2]]


def test_triangulation_roundtrip(rng):
    intr, extr, dist = _synthetic_rig(3)
    pts3d = rng.uniform(-0.5, 0.5, size=(6, 3)).astype(np.float32)
    pts2d = np.stack([_project(pts3d, intr[v], extr[v]) for v in range(3)], axis=0)
    # batch of 1
    out = np.asarray(
        cameras.project_camera_pairs_to_3d(
            pts2d[None].transpose(0, 1, 2, 3),
            intr[None],
            extr[None],
            dist[None],
        )
    )  # (1, pairs, K, 3)
    assert out.shape == (1, 3, 6, 3)
    for p in range(3):
        np.testing.assert_allclose(out[0, p], pts3d, atol=1e-2)


def test_project_3d_to_2d_matches_manual(rng):
    intr, extr, dist = _synthetic_rig(2)
    pts3d = rng.uniform(-0.5, 0.5, size=(5, 3)).astype(np.float32)
    out = np.asarray(
        cameras.project_3d_to_2d(pts3d[None], intr[None], extr[None], dist[None])
    )[0]
    for v in range(2):
        np.testing.assert_allclose(out[v], _project(pts3d, intr[v], extr[v]), atol=1e-2)


def test_distort_undistort_roundtrip(rng):
    import jax.numpy as jnp

    intr = np.array([[500.0, 0, 200], [0, 500.0, 200], [0, 0, 1]], np.float32)
    dist = np.array([0.1, -0.05, 0.001, 0.002, 0.01], np.float32)
    pts = rng.uniform(100, 300, size=(10, 2)).astype(np.float32)
    distorted = cameras.distort_points(jnp.asarray(pts), jnp.asarray(intr), jnp.asarray(dist))
    recovered = cameras.undistort_points(distorted, jnp.asarray(intr), jnp.asarray(dist))
    np.testing.assert_allclose(np.asarray(recovered), pts, atol=0.05)


def test_triangulate_fast(rng):
    intr, extr, dist = _synthetic_rig(3)
    pts3d = rng.uniform(-0.5, 0.5, size=(4, 3)).astype(np.float32)
    pts2d = np.stack([_project(pts3d, intr[v], extr[v]) for v in range(3)])
    frames = np.tile(pts2d[None], (2, 1, 1, 1))  # 2 frames
    out = cameras.triangulate_fast(frames, intr, extr, dist)
    assert out.shape == (2, 4, 3)
    np.testing.assert_allclose(out[0], pts3d, atol=1e-2)


def test_fit_similarity_transform(rng):
    import jax.numpy as jnp

    from lightning_pose_tpu.ops.augment3d import fit_similarity_transform

    src = rng.uniform(0, 100, size=(8, 2)).astype(np.float32)
    theta, scale, t = 0.3, 1.2, np.array([5.0, -3.0])
    rot = scale * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    dst = src @ rot.T + t
    m = np.asarray(fit_similarity_transform(jnp.asarray(src), jnp.asarray(dst)))
    recovered = src @ m[:2, :2].T + m[:2, 2]
    np.testing.assert_allclose(recovered, dst, atol=1e-3)
    # NaN pairs are ignored
    src_nan = src.copy(); src_nan[0] = np.nan
    m2 = np.asarray(
        fit_similarity_transform(jnp.asarray(src_nan), jnp.asarray(dst))
    )
    np.testing.assert_allclose(m2, m, atol=1e-3)


def test_apply_3d_transforms_identity(rng):
    """scale=1, translate=0 must leave keypoints (and images) unchanged."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.ops.augment3d import apply_3d_transforms

    intr, extr, dist = _synthetic_rig(2)
    pts3d = rng.uniform(-0.3, 0.3, size=(5, 3)).astype(np.float32)
    pts2d = np.stack([_project(pts3d, intr[v], extr[v]) for v in range(2)])
    kp_frame = pts2d.reshape(1, 10, 2).astype(np.float32)
    images = rng.uniform(0, 255, size=(1, 2, 64, 64, 3)).astype(np.float32)

    out_img, out_kp = apply_3d_transforms(
        jax.random.PRNGKey(0),
        jnp.asarray(images),
        jnp.asarray(kp_frame),
        jnp.asarray(intr[None]),
        jnp.asarray(extr[None]),
        jnp.asarray(dist[None]),
        scale_range=(1.0, 1.0),
        translate_range=0.0,
        apply_prob=1.0,
    )
    np.testing.assert_allclose(np.asarray(out_kp), kp_frame, atol=0.1)


def test_apply_3d_transforms_scales_keypoints(rng):
    """A pure scale perturbation moves reprojections coherently."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.ops.augment3d import apply_3d_transforms

    intr, extr, dist = _synthetic_rig(2)
    pts3d = rng.uniform(-0.3, 0.3, size=(5, 3)).astype(np.float32)
    pts2d = np.stack([_project(pts3d, intr[v], extr[v]) for v in range(2)])
    kp_frame = pts2d.reshape(1, 10, 2).astype(np.float32)
    images = rng.uniform(0, 255, size=(1, 2, 64, 64, 3)).astype(np.float32)

    out_img, out_kp = apply_3d_transforms(
        jax.random.PRNGKey(1),
        jnp.asarray(images),
        jnp.asarray(kp_frame),
        jnp.asarray(intr[None]),
        jnp.asarray(extr[None]),
        jnp.asarray(dist[None]),
        scale_range=(1.3, 1.3),
        translate_range=0.0,
        apply_prob=1.0,
    )
    moved = np.abs(np.asarray(out_kp) - kp_frame)
    assert moved.max() > 0.5  # keypoints moved
    assert np.isfinite(np.asarray(out_kp)).all()


def test_camera_group(rng):
    intr, extr, dist = _synthetic_rig(2)
    group = cameras.CameraGroup(intr, extr, dist)
    assert group.num_views == 2
    pts3d = rng.uniform(-0.3, 0.3, size=(3, 3)).astype(np.float32)
    pts2d = np.stack([_project(pts3d, intr[v], extr[v]) for v in range(2)])
    out = np.asarray(group.triangulate_fast(pts2d[None]))
    np.testing.assert_allclose(out[0], pts3d, atol=1e-2)
    proj = np.asarray(group.project(pts3d[None]))
    np.testing.assert_allclose(proj[0, 0], pts2d[0], atol=1e-2)


def test_apply_3d_transforms_all_nan_keypoints_noop(rng):
    """All-NaN samples must pass through unaugmented with finite images
    (reference datasets.py:1000-1010 skips augmentation entirely)."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.ops.augment3d import apply_3d_transforms

    intr, extr, dist = _synthetic_rig(2)
    images = rng.uniform(0, 255, size=(1, 2, 32, 32, 3)).astype(np.float32)
    kp = np.full((1, 8, 2), np.nan, dtype=np.float32)
    out_img, out_kp = apply_3d_transforms(
        jax.random.PRNGKey(0),
        jnp.asarray(images),
        jnp.asarray(kp),
        jnp.asarray(intr[None]),
        jnp.asarray(extr[None]),
        jnp.asarray(dist[None]),
        apply_prob=1.0,
    )
    np.testing.assert_allclose(np.asarray(out_img), images)
    assert np.isnan(np.asarray(out_kp)).all()


def test_apply_3d_transforms_insufficient_keypoints_skips(rng):
    """<3 valid triangulated keypoints -> sample left unaugmented
    (reference datasets.py:1017-1030)."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.ops.augment3d import apply_3d_transforms

    intr, extr, dist = _synthetic_rig(2)
    pts3d = rng.uniform(-0.3, 0.3, size=(5, 3)).astype(np.float32)
    pts2d = np.stack([_project(pts3d, intr[v], extr[v]) for v in range(2)])
    kp_frame = pts2d.reshape(1, 10, 2).astype(np.float32)
    # only 2 keypoints labeled in both views -> 2 valid triangulations
    kp_frame[:, 2:5] = np.nan   # view 0 keypoints 2-4
    kp_frame[:, 7:10] = np.nan  # view 1 keypoints 2-4
    images = rng.uniform(0, 255, size=(1, 2, 32, 32, 3)).astype(np.float32)
    out_img, out_kp = apply_3d_transforms(
        jax.random.PRNGKey(3),
        jnp.asarray(images),
        jnp.asarray(kp_frame),
        jnp.asarray(intr[None]),
        jnp.asarray(extr[None]),
        jnp.asarray(dist[None]),
        scale_range=(1.3, 1.3),
        apply_prob=1.0,
    )
    np.testing.assert_allclose(np.asarray(out_img), images)
    # unaugmented keypoints come back (in model coords == frame coords here
    # since frame_to_model is identity), NaNs preserved
    out = np.asarray(out_kp)
    np.testing.assert_allclose(out[0, :2], kp_frame[0, :2], atol=1e-3)
    assert np.isnan(out[0, 2:5]).all()


def test_apply_3d_transforms_matches_cv2_golden(rng):
    """Numeric golden: triangulate -> scale about centroid -> reproject must
    match cv2.projectPoints exactly (reference apply_3d_transforms
    semantics, reference datasets.py:825-1120; cv2 is the independent
    implementation)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.ops.augment3d import apply_3d_transforms

    intr, extr, dist = _synthetic_rig(2)
    pts3d = rng.uniform(-0.3, 0.3, size=(6, 3)).astype(np.float32)
    pts2d = np.stack([_project(pts3d, intr[v], extr[v]) for v in range(2)])
    kp_frame = pts2d.reshape(1, 12, 2).astype(np.float32)
    images = rng.uniform(0, 255, size=(1, 2, 32, 32, 3)).astype(np.float32)

    s = 1.25
    out_img, out_kp = apply_3d_transforms(
        jax.random.PRNGKey(5),
        jnp.asarray(images),
        jnp.asarray(kp_frame),
        jnp.asarray(intr[None]),
        jnp.asarray(extr[None]),
        jnp.asarray(dist[None]),
        scale_range=(s, s),
        translate_range=0.0,
        apply_prob=1.0,
    )

    # expected: exact projections triangulate back to pts3d; scale about the
    # 3D centroid; reproject through cv2 (Rodrigues + projectPoints)
    centroid = pts3d.mean(axis=0, keepdims=True)
    pts3d_new = (pts3d - centroid) * s + centroid
    expected = []
    for v in range(2):
        rvec, _ = cv2.Rodrigues(extr[v][:, :3])
        proj, _ = cv2.projectPoints(
            pts3d_new.astype(np.float64), rvec, extr[v][:, 3].astype(np.float64),
            intr[v].astype(np.float64), dist[v].astype(np.float64),
        )
        expected.append(proj.reshape(6, 2))
    expected = np.concatenate(expected, axis=0)  # (12, 2) view-major
    np.testing.assert_allclose(np.asarray(out_kp)[0], expected, atol=0.05)


def test_apply_3d_transforms_scaling_effect_monotonic(rng):
    """Larger scale perturbations move keypoints further (reference
    TestApply3DTransforms.test_scaling_effect)."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.ops.augment3d import apply_3d_transforms

    intr, extr, dist = _synthetic_rig(2)
    pts3d = rng.uniform(-0.3, 0.3, size=(5, 3)).astype(np.float32)
    pts2d = np.stack([_project(pts3d, intr[v], extr[v]) for v in range(2)])
    kp_frame = pts2d.reshape(1, 10, 2).astype(np.float32)
    images = rng.uniform(0, 255, size=(1, 2, 32, 32, 3)).astype(np.float32)

    def deviation(scale):
        _, out_kp = apply_3d_transforms(
            jax.random.PRNGKey(7),  # same rng stream for both runs
            jnp.asarray(images), jnp.asarray(kp_frame),
            jnp.asarray(intr[None]), jnp.asarray(extr[None]),
            jnp.asarray(dist[None]),
            scale_range=(scale, scale), translate_range=0.0, apply_prob=1.0,
        )
        return np.linalg.norm(np.asarray(out_kp) - kp_frame)

    assert deviation(1.5) > deviation(1.1) > 0.0


def test_apply_3d_transforms_translation_effect_monotonic(rng):
    """Larger shift parameter moves keypoints further (reference
    TestApply3DTransforms.test_translation_effect)."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.ops.augment3d import apply_3d_transforms

    intr, extr, dist = _synthetic_rig(2)
    pts3d = rng.uniform(-0.3, 0.3, size=(5, 3)).astype(np.float32)
    pts2d = np.stack([_project(pts3d, intr[v], extr[v]) for v in range(2)])
    kp_frame = pts2d.reshape(1, 10, 2).astype(np.float32)
    images = rng.uniform(0, 255, size=(1, 2, 32, 32, 3)).astype(np.float32)

    def deviation(translate):
        _, out_kp = apply_3d_transforms(
            jax.random.PRNGKey(9),
            jnp.asarray(images), jnp.asarray(kp_frame),
            jnp.asarray(intr[None]), jnp.asarray(extr[None]),
            jnp.asarray(dist[None]),
            scale_range=(1.0, 1.0), translate_range=translate, apply_prob=1.0,
        )
        return np.linalg.norm(np.asarray(out_kp) - kp_frame)

    assert deviation(1.0) > deviation(0.1) > 0.0


def test_apply_3d_transforms_mismatched_valid_views_skips(rng):
    """Each view has >=3 valid keypoints but the valid sets don't overlap:
    zero keypoints triangulate, so the sample must fall back to
    no-augmentation instead of erroring (reference
    test_mismatched_valid_keypoints_across_views)."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.ops.augment3d import apply_3d_transforms

    intr, extr, dist = _synthetic_rig(2)
    pts3d = rng.uniform(-0.3, 0.3, size=(6, 3)).astype(np.float32)
    pts2d = np.stack([_project(pts3d, intr[v], extr[v]) for v in range(2)])
    kp_frame = pts2d.reshape(1, 12, 2).astype(np.float32)
    # view 0: keypoints 0-2 valid; view 1: keypoints 3-5 valid (no overlap)
    kp_frame[:, 3:6] = np.nan
    kp_frame[:, 6:9] = np.nan
    images = rng.uniform(0, 255, size=(1, 2, 32, 32, 3)).astype(np.float32)

    out_img, out_kp = apply_3d_transforms(
        jax.random.PRNGKey(11),
        jnp.asarray(images), jnp.asarray(kp_frame),
        jnp.asarray(intr[None]), jnp.asarray(extr[None]),
        jnp.asarray(dist[None]),
        scale_range=(0.5, 0.5), translate_range=0.5, apply_prob=1.0,
    )
    np.testing.assert_allclose(np.asarray(out_img), images)
    out = np.asarray(out_kp)
    valid = ~np.isnan(kp_frame)
    np.testing.assert_allclose(out[valid], kp_frame[valid], atol=1e-3)
    assert np.isnan(out[~valid]).all()


def test_apply_3d_transforms_frame_to_model_mapping(rng):
    """With a non-identity frame_to_model affine (the bbox-crop resize
    mapping built in the train step), returned keypoints land in MODEL
    coordinates: frame_to_model @ reprojected-frame-coords."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.ops.augment3d import apply_3d_transforms

    intr, extr, dist = _synthetic_rig(2)
    pts3d = rng.uniform(-0.3, 0.3, size=(5, 3)).astype(np.float32)
    pts2d = np.stack([_project(pts3d, intr[v], extr[v]) for v in range(2)])
    kp_frame = pts2d.reshape(1, 10, 2).astype(np.float32)
    images = rng.uniform(0, 255, size=(1, 2, 32, 32, 3)).astype(np.float32)
    # per-view scale+offset affine (e.g. 400px frame -> 32px model crop)
    f2m = np.zeros((1, 2, 3, 3), dtype=np.float32)
    f2m[0, 0] = [[0.08, 0, -1.0], [0, 0.08, -2.0], [0, 0, 1]]
    f2m[0, 1] = [[0.10, 0, -3.0], [0, 0.10, -0.5], [0, 0, 1]]

    out_img, out_kp = apply_3d_transforms(
        jax.random.PRNGKey(0),
        jnp.asarray(images), jnp.asarray(kp_frame),
        jnp.asarray(intr[None]), jnp.asarray(extr[None]),
        jnp.asarray(dist[None]),
        frame_to_model=jnp.asarray(f2m),
        scale_range=(1.0, 1.0), translate_range=0.0, apply_prob=1.0,
    )
    # identity perturbation -> output = frame_to_model applied to inputs
    out = np.asarray(out_kp).reshape(2, 5, 2)
    for v in range(2):
        expected = pts2d[v] * f2m[0, v, 0, 0] + f2m[0, v, :2, 2]
        np.testing.assert_allclose(out[v], expected, atol=0.05)


def test_fit_similarity_transform_degenerate_is_identity():
    import jax.numpy as jnp

    from lightning_pose_tpu.ops.augment3d import fit_similarity_transform

    eye = np.eye(3, dtype=np.float32)
    # all-NaN
    m = np.asarray(
        fit_similarity_transform(
            jnp.full((4, 2), jnp.nan), jnp.full((4, 2), jnp.nan)
        )
    )
    np.testing.assert_allclose(m, eye)
    # one valid pair
    src = jnp.array([[1.0, 2.0], [jnp.nan, jnp.nan]])
    dst = jnp.array([[3.0, 4.0], [jnp.nan, jnp.nan]])
    np.testing.assert_allclose(np.asarray(fit_similarity_transform(src, dst)), eye)
    # coincident points (zero spread)
    src2 = jnp.ones((4, 2))
    dst2 = jnp.ones((4, 2)) * 2
    np.testing.assert_allclose(
        np.asarray(fit_similarity_transform(src2, dst2)), eye
    )
