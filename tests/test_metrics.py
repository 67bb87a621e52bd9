"""Tests for metrics + metric CSV side files
(mirroring reference tests/test_metrics.py)."""

import numpy as np
import pandas as pd
import pytest

from lightning_pose_tpu import metrics


def test_pixel_error():
    true = np.zeros((2, 3, 2))
    pred = np.zeros((2, 3, 2))
    pred[:, :, 0] = 3.0
    pred[:, :, 1] = 4.0
    err = metrics.pixel_error(true, pred)
    np.testing.assert_allclose(err, 5.0)


def test_temporal_norm():
    kp = np.zeros((4, 2, 2))
    kp[1, 0] = [3.0, 4.0]
    t = metrics.temporal_norm(kp)
    assert t.shape == (4, 2)
    assert np.isnan(t[0]).all()
    assert t[1, 0] == pytest.approx(5.0)
    assert t[2, 0] == pytest.approx(5.0)  # moves back
    assert t[3, 0] == 0.0


def _write_preds_csv(path, n_frames, keypoint_names, with_set=False, index=None):
    cols = pd.MultiIndex.from_product(
        [["tracker"], keypoint_names, ["x", "y", "likelihood"]],
        names=["scorer", "bodyparts", "coords"],
    )
    rng = np.random.default_rng(0)
    arr = rng.uniform(0, 100, size=(n_frames, len(keypoint_names) * 3))
    df = pd.DataFrame(arr, columns=cols)
    if index is not None:
        df.index = index
    if with_set:
        df["set"] = ["train"] * n_frames
    df.to_csv(path)
    return df


def test_compute_metrics_single_video(tmp_path, cfg):
    preds_file = tmp_path / "vid.csv"
    _write_preds_csv(preds_file, 10, cfg.data.keypoint_names)
    result = metrics.compute_metrics_single(
        cfg=cfg, labels_file=None, preds_file=str(preds_file)
    )
    assert result.temporal_norm_df is not None
    assert (tmp_path / "vid_temporal_norm.csv").exists()
    assert result.pixel_error_df is None


def test_compute_metrics_single_labeled(tmp_path, cfg, toy_data_dir):
    import os

    labels_file = os.path.join(toy_data_dir, "CollectedData.csv")
    labels = pd.read_csv(labels_file, header=[0, 1, 2], index_col=0)
    preds_file = tmp_path / "predictions.csv"
    _write_preds_csv(
        preds_file, len(labels), cfg.data.keypoint_names, with_set=True,
        index=labels.index,
    )
    result = metrics.compute_metrics_single(
        cfg=cfg, labels_file=labels_file, preds_file=str(preds_file)
    )
    assert result.pixel_error_df is not None
    assert (tmp_path / "predictions_pixel_error.csv").exists()
    # set column is preserved in the side file
    side = pd.read_csv(tmp_path / "predictions_pixel_error.csv", index_col=0)
    assert "set" in side.columns
