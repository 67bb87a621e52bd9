"""Invariant tests for the device augmentation engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_pose_tpu.ops.augment import AugmentationEngine, grid_sample_bilinear


@pytest.fixture()
def images(rng):
    return rng.integers(0, 255, size=(4, 64, 64, 3)).astype(np.uint8)


@pytest.fixture()
def keypoints(rng):
    return rng.uniform(10, 54, size=(4, 5, 2)).astype(np.float32)


def test_default_is_identity(images, keypoints):
    eng = AugmentationEngine("default", 64, 64)
    key = jax.random.PRNGKey(0)
    out_imgs, out_kps = eng(key, jnp.asarray(images), jnp.asarray(keypoints))
    np.testing.assert_allclose(np.asarray(out_imgs), images.astype(np.float32))
    np.testing.assert_allclose(np.asarray(out_kps), keypoints)


def test_dlc_preserves_shapes_and_range(images, keypoints):
    eng = AugmentationEngine("dlc", 64, 64)
    key = jax.random.PRNGKey(3)
    out_imgs, out_kps = eng(key, jnp.asarray(images), jnp.asarray(keypoints))
    assert out_imgs.shape == images.shape
    assert out_kps.shape == keypoints.shape
    arr = np.asarray(out_imgs)
    assert arr.min() >= 0.0 and arr.max() <= 255.0
    # in-bounds keypoints stay finite or become NaN (cropped out), never inf
    kps = np.asarray(out_kps)
    assert np.all(np.isfinite(kps) | np.isnan(kps))


def test_dlc_is_random_but_seeded(images, keypoints):
    eng = AugmentationEngine("dlc", 64, 64)
    a1, k1 = eng(jax.random.PRNGKey(1), jnp.asarray(images), jnp.asarray(keypoints))
    a2, k2 = eng(jax.random.PRNGKey(1), jnp.asarray(images), jnp.asarray(keypoints))
    a3, _ = eng(jax.random.PRNGKey(2), jnp.asarray(images), jnp.asarray(keypoints))
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
    assert not np.allclose(np.asarray(a1), np.asarray(a3))


def test_dlc_mv_keeps_keypoints_fixed(images, keypoints):
    """dlc-mv has no geometric transforms (reference augmentations.py:147,
    192, 216) so keypoints are untouched."""
    eng = AugmentationEngine("dlc-mv", 64, 64)
    _, out_kps = eng(jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(keypoints))
    np.testing.assert_allclose(np.asarray(out_kps), keypoints, atol=1e-4)


def test_context_stack_shares_transform(rng, keypoints):
    """5D input: all frames of a sample get the same geometric transform."""
    frames = np.tile(
        rng.integers(0, 255, size=(2, 1, 64, 64, 3)).astype(np.uint8), (1, 5, 1, 1, 1)
    )
    eng = AugmentationEngine("dlc", 64, 64)
    out, _ = eng(jax.random.PRNGKey(0), jnp.asarray(frames), jnp.asarray(keypoints[:2]))
    assert out.shape == frames.shape
    arr = np.asarray(out)
    # identical input frames + one shared transform -> identical output frames
    np.testing.assert_allclose(arr[:, 0], arr[:, 1], atol=1e-3)
    np.testing.assert_allclose(arr[:, 0], arr[:, 4], atol=1e-3)


def test_hflip_swaps_keypoints(rng):
    imgs = rng.integers(0, 255, size=(64, 32, 32, 3)).astype(np.uint8)
    kps = np.tile(np.array([[[4.0, 10.0], [20.0, 10.0]]], dtype=np.float32), (64, 1, 1))
    swap = np.array([1, 0])
    eng = AugmentationEngine("none", 32, 32, hflip=True, hflip_swap_indices=swap)
    _, out_kps = eng(jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(kps))
    out = np.asarray(out_kps)
    # each sample is either unflipped or flipped+swapped
    unflipped = np.allclose(out, kps, atol=1e-3)
    flipped_count = 0
    for i in range(64):
        if np.allclose(out[i], kps[i], atol=1e-3):
            continue
        flipped_count += 1
        # x mirrored: 31 - x, and keypoint identity swapped
        np.testing.assert_allclose(out[i, 0, 0], 31 - kps[i, 1, 0], atol=1e-3)
        np.testing.assert_allclose(out[i, 1, 0], 31 - kps[i, 0, 0], atol=1e-3)
        np.testing.assert_allclose(out[i, :, 1], kps[i, :, 1], atol=1e-3)
    # with p=0.5 over 64 samples, both outcomes should occur
    assert 0 < flipped_count < 64


def test_hflip_swaps_visibility_with_keypoints(rng):
    """Visibility flags must ride the same _left/_right identity swap as the
    keypoints on flipped samples (reference datasets.py:338)."""
    imgs = rng.integers(0, 255, size=(64, 32, 32, 3)).astype(np.uint8)
    kps = np.tile(
        np.array([[[4.0, 10.0], [20.0, 10.0]]], dtype=np.float32), (64, 1, 1)
    )
    vis = np.tile(np.array([[2, 1]], dtype=np.int32), (64, 1))
    swap = np.array([1, 0])
    eng = AugmentationEngine("none", 32, 32, hflip=True, hflip_swap_indices=swap)
    _, out_kps, out_vis = eng(
        jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(kps),
        jnp.asarray(vis),
    )
    out_kps, out_vis = np.asarray(out_kps), np.asarray(out_vis)
    flipped = ~np.isclose(out_kps[:, 0, 0], kps[:, 0, 0], atol=1e-3)
    assert 0 < flipped.sum() < 64
    np.testing.assert_array_equal(out_vis[flipped], vis[flipped][:, ::-1])
    np.testing.assert_array_equal(out_vis[~flipped], vis[~flipped])
    # without visibility the engine still returns a 2-tuple
    out2 = eng(jax.random.PRNGKey(0), jnp.asarray(imgs), jnp.asarray(kps))
    assert len(out2) == 2


def test_grid_sample_identity(rng):
    imgs = rng.uniform(0, 255, size=(1, 16, 16, 3)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    coords = np.stack([xs, ys], axis=-1)[None].astype(np.float32)
    out = grid_sample_bilinear(jnp.asarray(imgs), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(out), imgs, atol=1e-4)


def test_grid_sample_zero_outside(rng):
    imgs = rng.uniform(1, 255, size=(1, 8, 8, 1)).astype(np.float32)
    coords = np.full((1, 4, 4, 2), -10.0, dtype=np.float32)
    out = grid_sample_bilinear(jnp.asarray(imgs), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_video_augment_sequence():
    from lightning_pose_tpu.ops.video_augment import augment_video_sequence
    from lightning_pose_tpu.data.video import undo_affine_transform_batch

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(4, 64, 64, 3)).astype(np.uint8)
    out, transforms = augment_video_sequence(
        jax.random.PRNGKey(0), jnp.asarray(frames, dtype=jnp.float32)
    )
    assert out.shape == frames.shape
    assert transforms.shape == (4, 2, 3)
    # undo round-trip: transform keypoints forward then undo them
    kp = rng.uniform(5, 59, size=(4, 3, 2)).astype(np.float32)
    t = np.asarray(transforms)
    kp_aug = np.einsum("bij,bkj->bki", t[:, :, :2], kp) + t[:, None, :, 2]
    kp_back = undo_affine_transform_batch(
        jnp.asarray(kp_aug.reshape(4, -1)), jnp.asarray(transforms)
    )
    np.testing.assert_allclose(
        np.asarray(kp_back).reshape(4, 3, 2), kp, rtol=1e-3, atol=1e-3
    )


# ------------------------------------------------------------------ cv2 parity
# imgaug is not installed in this environment, so per-op behavior is
# cross-checked against cv2 (the library imgaug itself wraps for these ops)
# with quantified deviation bounds.


def test_affine_warp_matches_cv2(rng):
    """grid_sample with a target->source affine == cv2.warpAffine
    (WARP_INVERSE_MAP, bilinear, zero border)."""
    import cv2

    img = rng.uniform(0, 255, size=(40, 48, 3)).astype(np.float32)
    theta = 0.3
    m = np.array(
        [[np.cos(theta), -np.sin(theta), 3.0],
         [np.sin(theta), np.cos(theta), -2.0]], dtype=np.float32
    )
    ref = cv2.warpAffine(
        img, m, (48, 40),
        flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    ys, xs = np.meshgrid(np.arange(40), np.arange(48), indexing="ij")
    grid = np.stack([xs, ys, np.ones_like(xs)], axis=-1).astype(np.float32)
    coords = grid @ m.T  # (H, W, 2) source coords
    out = np.asarray(
        grid_sample_bilinear(jnp.asarray(img[None]), jnp.asarray(coords[None]))
    )[0]
    # interior only: cv2 treats border pixels with partial coverage slightly
    # differently than pure zero-padding
    diff = np.abs(out[2:-2, 2:-2] - ref[2:-2, 2:-2])
    assert diff.max() < 1e-2, f"max deviation {diff.max()}"


def test_equalize_hist_matches_cv2(rng):
    """_equalize_hist (no clip) vs cv2.equalizeHist per channel; small
    deviations allowed (cv2 anchors the CDF at the first populated bin)."""
    import cv2

    from lightning_pose_tpu.ops.augment import _equalize_hist

    img = rng.uniform(0, 255, size=(32, 32, 3)).astype(np.float32)
    img_u8 = img.astype(np.uint8)
    ref = np.stack(
        [cv2.equalizeHist(img_u8[..., ch]) for ch in range(3)], axis=-1
    ).astype(np.float32)
    out = np.asarray(_equalize_hist(jnp.asarray(img_u8[None].astype(np.float32))))[0]
    diff = np.abs(out - ref)
    assert diff.max() <= 3.0, f"max deviation {diff.max()} gray levels"


@pytest.mark.parametrize("clip", [1.0, 2.0, 4.0, 8.0])
@pytest.mark.parametrize("grid", [8, 16])
def test_clahe_tiled_matches_cv2(rng, clip, grid):
    """_equalize_clahe_tiled vs cv2.createCLAHE across clip limits and tile
    grids: per-tile integer clip/redistribution + bilinear LUT
    interpolation (the reference's AllChannelsCLAHE backend, reference
    augmentations.py:203-205). Small residuals allowed (cv2's residual
    redistribution loop + uint8 rounding)."""
    import cv2

    from lightning_pose_tpu.ops.augment import _equalize_clahe_tiled

    img = np.linspace(0, 200, 128)[None, :] * np.ones((128, 1))
    img = img + rng.normal(0, 20, (128, 128))
    img[20:50, 20:50] += 50
    img[70:110, 60:100] -= 40
    img_u8 = np.clip(img, 0, 255).astype(np.uint8)
    ref = cv2.createCLAHE(
        clipLimit=clip, tileGridSize=(grid, grid)
    ).apply(img_u8).astype(np.float32)
    out = np.asarray(
        _equalize_clahe_tiled(
            jnp.asarray(img_u8[None, :, :, None], jnp.float32),
            jnp.asarray([clip], jnp.float32),
            grid=grid,
        )
    )[0, :, :, 0]
    diff = np.abs(out - ref)
    # residuals grow as tiles shrink (a 128px/16-grid tile holds 64 pixels
    # across 256 bins, so cv2's +-1-count residual pass moves the CDF by
    # several gray levels); measured envelope: mean<=2.5, max<=14
    assert diff.mean() <= 3.0, f"mean deviation {diff.mean()} gray levels"
    assert np.percentile(diff, 95) <= 7.0
    assert diff.max() <= 16.0, f"max deviation {diff.max()} gray levels"


def test_clahe_tiled_batch_channels_and_fallback(rng):
    """Multi-channel batches apply per-image clip limits independently;
    non-divisible dims fall back to the global equalization."""
    from lightning_pose_tpu.ops.augment import (
        _equalize_clahe_tiled,
        _equalize_hist,
    )

    imgs = rng.uniform(0, 255, size=(2, 64, 64, 3)).astype(np.float32)
    clips = jnp.asarray([2.0, 8.0], jnp.float32)
    out = np.asarray(_equalize_clahe_tiled(jnp.asarray(imgs), clips, grid=8))
    assert out.shape == imgs.shape
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 255
    # batch independence: single-image result == its slot in the batch
    solo = np.asarray(
        _equalize_clahe_tiled(jnp.asarray(imgs[:1]), clips[:1], grid=8)
    )
    np.testing.assert_allclose(out[0], solo[0], atol=1e-3)

    # 60 is not divisible by 2*grid=16 -> global fallback
    odd = rng.uniform(0, 255, size=(1, 60, 60, 1)).astype(np.float32)
    fb = np.asarray(_equalize_clahe_tiled(jnp.asarray(odd), clips[:1], grid=8))
    ref = np.asarray(_equalize_hist(jnp.asarray(odd), clip_limit=clips[:1]))
    np.testing.assert_allclose(fb, ref, atol=1e-3)


def test_emboss_matches_cv2_kernel(rng):
    """_emboss == alpha-blend of cv2.filter2D with imgaug's emboss kernel
    [[-1-s, -s, 0], [-s, 1, s], [0, s, 1+s]] (interior pixels)."""
    import cv2

    from lightning_pose_tpu.ops.augment import _emboss

    img = rng.uniform(0, 255, size=(24, 24, 3)).astype(np.float32)
    alpha, strength = 0.7, 0.9
    k = np.array(
        [[-1 - strength, -strength, 0],
         [-strength, 1, strength],
         [0, strength, 1 + strength]], dtype=np.float32
    )
    embossed = cv2.filter2D(img, -1, k, borderType=cv2.BORDER_CONSTANT)
    ref = np.clip((1 - alpha) * img + alpha * embossed, 0, 255)
    out = np.asarray(
        _emboss(
            jnp.asarray(img[None]),
            jnp.asarray([alpha], dtype=np.float32),
            jnp.asarray([strength], dtype=np.float32),
        )
    )[0]
    diff = np.abs(out[1:-1, 1:-1] - ref[1:-1, 1:-1])
    assert diff.max() < 1e-2, f"max deviation {diff.max()}"


def test_clahe_and_emboss_rng_streams_are_independent():
    """The CLAHE gate/clip and emboss gate/alpha/strength draws use distinct
    subkeys — gate and magnitude must not be deterministic functions of each
    other (previously keys[22]/keys[23] were reused)."""
    import inspect

    from lightning_pose_tpu.ops import augment as aug_mod

    src = inspect.getsource(aug_mod.AugmentationEngine._augment)
    gate_cl = src.count("keys[22]")
    assert gate_cl == 1, "CLAHE gate key reused for another draw"
    gate_em = src.count("keys[23]")
    assert gate_em == 1, "emboss gate key reused for another draw"


# -- per-op semantics via single-op dict pipelines ----------------------------


def _engine(spec_dict, h=64, w=64):
    from lightning_pose_tpu.ops.augment import AugmentationEngine

    return AugmentationEngine(spec_dict, image_height=h, image_width=w)


def test_rot90_k2_maps_images_and_keypoints():
    """k=2 (180 deg) flips both axes; keypoints map to (w-1-x, h-1-y)
    (the reference's Rot90 in dlc-lr, augmentations.py:150-160)."""
    import jax

    rng = np.random.default_rng(3)
    images = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.float32)
    kps = rng.uniform(5, 58, (2, 4, 2)).astype(np.float32)
    eng = _engine({"Rot90": {"p": 1.0, "kwargs": {"k": [2]}}})
    out, kp_out = eng(jax.random.PRNGKey(0), images, kps)
    np.testing.assert_allclose(
        np.asarray(out), images[:, ::-1, ::-1], atol=1.0
    )
    np.testing.assert_allclose(
        np.asarray(kp_out), np.stack(
            [63.0 - kps[..., 0], 63.0 - kps[..., 1]], axis=-1
        ), atol=0.51,
    )


def test_coarse_dropout_zeroes_blocks():
    import jax

    images = np.full((2, 64, 64, 3), 200.0, dtype=np.float32)
    kps = np.zeros((2, 3, 2), dtype=np.float32)
    eng = _engine({
        "CoarseDropout": {
            "p": 1.0,
            "kwargs": {"p": 0.1, "size_percent": 0.25, "per_channel": 0.0},
        }
    })
    out, _ = eng(jax.random.PRNGKey(1), images, kps)
    arr = np.asarray(out)
    vals = set(np.unique(arr))
    assert vals <= {0.0, 200.0}
    frac = (arr == 0).mean()
    assert 0.01 < frac < 0.5  # blocks dropped, image not destroyed


def test_coarse_salt_and_pepper_values():
    import jax

    images = np.full((2, 64, 64, 3), 100.0, dtype=np.float32)
    kps = np.zeros((2, 3, 2), dtype=np.float32)
    out_s, _ = _engine({
        "CoarseSalt": {"p": 1.0, "kwargs": {"p": 0.05, "size_percent": 0.1}}
    })(jax.random.PRNGKey(2), images, kps)
    arr_s = np.asarray(out_s)
    assert set(np.unique(arr_s)) <= {100.0, 255.0}
    assert (arr_s == 255.0).any()

    out_p, _ = _engine({
        "CoarsePepper": {"p": 1.0, "kwargs": {"p": 0.05, "size_percent": 0.1}}
    })(jax.random.PRNGKey(3), images, kps)
    arr_p = np.asarray(out_p)
    assert set(np.unique(arr_p)) <= {0.0, 100.0}
    assert (arr_p == 0.0).any()


import jax  # noqa: E402  (used by the per-op tests above)


def test_motion_blur_preserves_mean_and_blurs():
    """Motion blur is a normalized line kernel: constant regions unchanged,
    a vertical edge spreads along the blur direction."""
    images = np.full((1, 64, 64, 3), 120.0, dtype=np.float32)
    kps = np.zeros((1, 2, 2), dtype=np.float32)
    eng = _engine({
        "MotionBlur": {"p": 1.0, "kwargs": {"k": 5, "angle": [90, 90]}}
    })
    out, _ = eng(jax.random.PRNGKey(4), images, kps)
    np.testing.assert_allclose(np.asarray(out), 120.0, atol=1.0)

    edge = np.zeros((1, 64, 64, 3), dtype=np.float32)
    edge[:, :, 32:] = 255.0
    out2, _ = eng(jax.random.PRNGKey(5), edge, kps)
    arr = np.asarray(out2)
    # intermediate values appear where the kernel straddles the edge
    mid = ((arr > 10) & (arr < 245)).mean()
    assert mid > 0.005


def test_elastic_keypoints_follow_displacement():
    """With alpha=0 elastic is identity for both image and keypoints."""
    rng = np.random.default_rng(6)
    images = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.float32)
    kps = rng.uniform(10, 50, (1, 4, 2)).astype(np.float32)
    eng = _engine({
        "ElasticTransformation": {
            "p": 1.0, "kwargs": {"alpha": [0.0, 0.0], "sigma": 5.0}
        }
    })
    out, kp_out = eng(jax.random.PRNGKey(7), images, kps)
    np.testing.assert_allclose(np.asarray(out), images, atol=1.0)
    np.testing.assert_allclose(np.asarray(kp_out), kps, atol=0.1)


@pytest.mark.parametrize(
    "name,args",
    [
        ("Affine", {"p": 1.0, "kwargs": {"rotate": [20, 20]}}),
        ("CropAndPad", {"p": 1.0, "kwargs": {"percent": [-0.12, -0.12]}}),
        ("Rot90", {"p": 1.0, "kwargs": {"k": [1]}}),
        ("Fliplr", {"p": 1.0}),
        ("ElasticTransformation",
         {"p": 1.0, "kwargs": {"alpha": [8.0, 8.0], "sigma": 5.0}}),
    ],
)
def test_geometric_ops_keep_image_keypoint_consistency(name, args):
    """A bright dot rendered at the keypoint must land (to within the
    interpolation footprint) at the TRANSFORMED keypoint location for
    every geometric op — image warp and keypoint math share one
    transform."""
    h = w = 96
    kp = np.array([[[60.0, 40.0]]], dtype=np.float32)
    images = np.zeros((1, h, w, 3), dtype=np.float32)
    y0, x0 = int(kp[0, 0, 1]), int(kp[0, 0, 0])
    images[0, y0 - 1:y0 + 2, x0 - 1:x0 + 2, :] = 255.0

    eng = _engine({name: args}, h=h, w=w)
    out, kp_out = eng(jax.random.PRNGKey(11), images, kp)
    out = np.asarray(out)[0, :, :, 0]
    kp_new = np.asarray(kp_out)[0, 0]
    assert np.isfinite(kp_new).all(), f"{name}: keypoint lost"

    peak_y, peak_x = np.unravel_index(np.argmax(out), out.shape)
    dist = np.hypot(peak_x - kp_new[0], peak_y - kp_new[1])
    assert dist <= 2.5, (
        f"{name}: dot at ({peak_x}, {peak_y}) but keypoint at {kp_new}"
    )


@pytest.mark.parametrize("t", [1, 5])
@pytest.mark.parametrize("n_fired", [0, 2, 9])
def test_apply_per_group_sparse_equals_dense(t, n_fired):
    """The sparse gathered-subset application of rare per-image ops must be
    bit-identical to the branchless dense form, across the lax.cond
    boundary (n_fired=9 > m forces the dense fallback) and for context
    stacks (t>1 frames share one flag per group)."""
    from lightning_pose_tpu.ops.augment import (
        _apply_per_group,
        _equalize_clahe_tiled,
        _equalize_hist,
    )

    b = 16
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (b * t, 64, 64, 3)).astype(np.float32)
    )
    apply_g = np.zeros(b, dtype=bool)
    apply_g[rng.choice(b, n_fired, replace=False)] = True
    apply_g = jnp.asarray(apply_g)
    clip = jnp.asarray(rng.uniform(1.0, 4.0, b).astype(np.float32))

    def rep(x):
        return jnp.repeat(x, t, axis=0) if t > 1 else x

    # histeq (no extras)
    sparse = _apply_per_group(images, apply_g, t, _equalize_hist)
    dense = jnp.where(
        rep(apply_g)[:, None, None, None], _equalize_hist(images), images
    )
    np.testing.assert_array_equal(np.asarray(sparse), np.asarray(dense))

    # clahe (per-image clip extra); grid=8 divides 64 into half-blocks
    fn = lambda sub, cl: _equalize_clahe_tiled(sub, clip_limit=cl, grid=8)
    sparse = _apply_per_group(images, apply_g, t, fn, extras=(clip,))
    dense = jnp.where(
        rep(apply_g)[:, None, None, None], fn(images, rep(clip)), images
    )
    np.testing.assert_array_equal(np.asarray(sparse), np.asarray(dense))

    # emboss (two per-image extras: alpha + strength). Not bit-exact like
    # the LUT ops: XLA fuses the depthwise conv differently at batch m vs
    # b, reassociating the 3x3 reduction (~3e-5 noise on 0-255 images).
    from lightning_pose_tpu.ops.augment import _emboss

    alpha = jnp.asarray(rng.uniform(0.0, 0.5, b).astype(np.float32))
    strength = jnp.asarray(rng.uniform(0.5, 1.5, b).astype(np.float32))
    sparse = _apply_per_group(
        images, apply_g, t, _emboss, extras=(alpha, strength)
    )
    dense = jnp.where(
        rep(apply_g)[:, None, None, None],
        _emboss(images, rep(alpha), rep(strength)),
        images,
    )
    np.testing.assert_allclose(
        np.asarray(sparse), np.asarray(dense), rtol=0, atol=1e-4
    )
