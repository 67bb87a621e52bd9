"""Unit tests for loss functions (zero-at-equality, masking, epsilon
rectification — mirroring reference tests/losses/test_losses.py semantics)."""

import numpy as np
import pytest

from lightning_pose_tpu.data.heatmaps import generate_heatmaps
from lightning_pose_tpu.losses import (
    HeatmapJSLoss,
    HeatmapKLLoss,
    HeatmapMSELoss,
    RegressionMSELoss,
    RegressionRMSELoss,
    TemporalLoss,
    UnimodalLoss,
)


def _gaussian_heatmaps(rng, b=2, k=3, hw=32):
    kps = rng.uniform(5, 120, size=(b, k, 2)).astype(np.float32)
    return np.asarray(generate_heatmaps(kps, 128, 128, (hw, hw)))


def test_weight_formula():
    loss = HeatmapMSELoss(log_weight=11.0)
    assert loss.weight == pytest.approx(1.0 / (2.0 * np.exp(11.0)))


def test_heatmap_mse_zero_at_equality(rng):
    hm = _gaussian_heatmaps(rng)
    loss, logs = HeatmapMSELoss()(heatmaps_targ=hm, heatmaps_pred=hm, stage="train")
    assert float(loss) == pytest.approx(0.0, abs=1e-10)
    assert "train_heatmap_mse_loss" in logs


def test_heatmap_mse_positive_and_scaled(rng):
    hm = _gaussian_heatmaps(rng, hw=32)
    pred = np.roll(hm, 3, axis=1)
    loss, _ = HeatmapMSELoss()(heatmaps_targ=hm, heatmaps_pred=pred)
    assert float(loss) > 0
    # the h*w scaling: same shapes at double resolution give comparable loss scale
    manual = np.mean((hm - pred) ** 2) * 32 * 32
    assert float(loss) == pytest.approx(manual, rel=1e-5)


def test_heatmap_mse_masks_zero_targets(rng):
    hm = _gaussian_heatmaps(rng, b=1, k=2)
    targ = hm.copy()
    targ[0, :, :, 1] = 0.0  # unlabeled keypoint
    pred = np.roll(hm, 2, axis=2)
    loss_masked, _ = HeatmapMSELoss()(heatmaps_targ=targ, heatmaps_pred=pred)
    # equals loss computed on the valid keypoint only
    loss_single, _ = HeatmapMSELoss()(
        heatmaps_targ=targ[:, :, :, :1], heatmaps_pred=pred[:, :, :, :1]
    )
    assert float(loss_masked) == pytest.approx(float(loss_single), rel=1e-5)


def test_heatmap_kl_js_zero_at_equality(rng):
    hm = _gaussian_heatmaps(rng)
    for cls in [HeatmapKLLoss, HeatmapJSLoss]:
        loss, _ = cls()(heatmaps_targ=hm, heatmaps_pred=hm)
        assert float(loss) == pytest.approx(0.0, abs=1e-4)
        shifted = np.roll(hm, 5, axis=1)
        loss2, _ = cls()(heatmaps_targ=hm, heatmaps_pred=shifted)
        assert float(loss2) > float(loss)


def test_temporal_loss_known_value():
    # constant predictions -> zero temporal loss
    preds = np.ones((4, 6), dtype=np.float32)
    loss, _ = TemporalLoss()(keypoints_pred=preds)
    assert float(loss) == pytest.approx(0.0, abs=1e-5)
    # one keypoint moves 3px in x and 4px in y each frame -> norm 5 per step
    preds = np.zeros((3, 2), dtype=np.float32)
    preds[1] = [3.0, 4.0]
    preds[2] = [6.0, 8.0]
    loss, _ = TemporalLoss()(keypoints_pred=preds)
    assert float(loss) == pytest.approx(5.0, rel=1e-4)


def test_temporal_loss_epsilon():
    preds = np.zeros((3, 2), dtype=np.float32)
    preds[1] = [3.0, 4.0]
    preds[2] = [6.0, 8.0]
    loss, _ = TemporalLoss(epsilon=5.0)(keypoints_pred=preds)
    assert float(loss) == pytest.approx(0.0, abs=1e-5)
    loss, _ = TemporalLoss(epsilon=2.0)(keypoints_pred=preds)
    assert float(loss) == pytest.approx(3.0, rel=1e-4)


def test_temporal_loss_epsilon_per_keypoint():
    preds = np.zeros((2, 4), dtype=np.float32)
    preds[1] = [3.0, 4.0, 3.0, 4.0]  # both keypoints move 5px
    loss, _ = TemporalLoss(epsilon=[5.0, 1.0])(keypoints_pred=preds)
    assert float(loss) == pytest.approx((0.0 + 4.0) / 2, rel=1e-4)


def test_temporal_loss_confidence_masking():
    preds = np.zeros((3, 2), dtype=np.float32)
    preds[1] = [3.0, 4.0]
    preds[2] = [6.0, 8.0]
    conf = np.array([[1.0], [0.01], [1.0]], dtype=np.float32)
    # middle frame below threshold kills both diffs
    loss, _ = TemporalLoss(prob_threshold=0.05)(keypoints_pred=preds, confidences=conf)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)


def test_regression_mse_nan_masking(rng):
    targ = rng.uniform(0, 100, size=(3, 8)).astype(np.float32)
    pred = targ + 1.0
    loss, _ = RegressionMSELoss()(keypoints_targ=targ, keypoints_pred=pred)
    assert float(loss) == pytest.approx(1.0, rel=1e-5)
    targ_nan = targ.copy()
    targ_nan[0, :2] = np.nan
    # nan entries excluded; others still off by 1 -> loss still 1
    loss, _ = RegressionMSELoss()(keypoints_targ=targ_nan, keypoints_pred=pred)
    assert float(loss) == pytest.approx(1.0, rel=1e-5)


def test_regression_rmse_pixel_error(rng):
    targ = rng.uniform(0, 100, size=(2, 6)).astype(np.float32)
    pred = targ.copy().reshape(2, 3, 2)
    pred[:, :, 0] += 3.0
    pred[:, :, 1] += 4.0
    # rmse per keypoint = sqrt((9+16)/2)
    loss, _ = RegressionRMSELoss()(
        keypoints_targ=targ, keypoints_pred=pred.reshape(2, 6)
    )
    assert float(loss) == pytest.approx(np.sqrt(12.5), rel=1e-4)


def test_unimodal_mse(rng):
    b, k, hw = 2, 3, 32
    kps = rng.uniform(10, 110, size=(b, k, 2)).astype(np.float32)
    ideal = np.asarray(generate_heatmaps(kps, 128, 128, (hw, hw)))
    conf = np.ones((b, k), dtype=np.float32)
    loss_fn = UnimodalLoss(
        loss_name="unimodal_mse",
        original_image_height=128,
        original_image_width=128,
        downsampled_image_height=hw,
        downsampled_image_width=hw,
    )
    # prediction equal to the ideal unimodal heatmap -> zero loss
    loss, _ = loss_fn(
        keypoints_pred_augmented=kps.reshape(b, -1),
        heatmaps_pred=ideal,
        confidences=conf,
    )
    assert float(loss) == pytest.approx(0.0, abs=1e-9)
    # bimodal prediction -> positive loss
    bimodal = 0.5 * ideal + 0.5 * np.roll(ideal, 10, axis=1)
    loss2, _ = loss_fn(
        keypoints_pred_augmented=kps.reshape(b, -1),
        heatmaps_pred=bimodal,
        confidences=conf,
    )
    assert float(loss2) > 0


def test_unimodal_confidence_masking(rng):
    b, k, hw = 1, 2, 32
    kps = rng.uniform(10, 110, size=(b, k, 2)).astype(np.float32)
    ideal = np.asarray(generate_heatmaps(kps, 128, 128, (hw, hw)))
    bad = ideal.copy()
    bad[0, :, :, 1] = np.roll(ideal[0, :, :, 1], 8, axis=0)
    conf = np.array([[1.0, 0.0]], dtype=np.float32)  # mask the bad keypoint
    loss_fn = UnimodalLoss(
        loss_name="unimodal_mse",
        original_image_height=128, original_image_width=128,
        downsampled_image_height=hw, downsampled_image_width=hw,
        prob_threshold=0.5,
    )
    loss, _ = loss_fn(
        keypoints_pred_augmented=kps.reshape(b, -1), heatmaps_pred=bad, confidences=conf
    )
    assert float(loss) == pytest.approx(0.0, abs=1e-9)
