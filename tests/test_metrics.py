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


def test_compute_metrics_single_with_visible_column(tmp_path, cfg):
    """Labels CSVs carrying a per-keypoint `visible` coord column must not
    break the (N, K, 2) reshape (reference regression test,
    tests/test_metrics.py:62-124)."""
    import pandas as pd

    from lightning_pose_tpu.metrics import compute_metrics_single

    n_frames, n_keypoints = 4, 3
    keypoints = [f"kp{i}" for i in range(n_keypoints)]
    frames = [f"labeled-data/s/frame{i:04d}.png" for i in range(n_frames)]
    rng = np.random.default_rng(0)

    label_cols = pd.MultiIndex.from_tuples(
        [("sc", kp, c) for kp in keypoints for c in ("x", "y", "visible")],
        names=["scorer", "bodyparts", "coords"],
    )
    labels = pd.DataFrame(
        np.column_stack(
            [rng.random(n_frames) * 100 if c in ("x", "y")
             else np.full(n_frames, 2.0)
             for _, _, c in label_cols]
        ),
        index=pd.Index(frames), columns=label_cols,
    )
    labels.to_csv(tmp_path / "labels.csv")

    pred_cols = pd.MultiIndex.from_tuples(
        [("sc", kp, c) for kp in keypoints for c in ("x", "y", "likelihood")]
        + [("set", "set", "set")],
        names=["scorer", "bodyparts", "coords"],
    )
    preds = pd.DataFrame(index=pd.Index(frames), columns=pred_cols)
    for col in pred_cols:
        if col[2] in ("x", "y"):
            preds[col] = rng.random(n_frames) * 100
        elif col[2] == "likelihood":
            preds[col] = 0.9
        else:
            preds[col] = "train"
    preds.to_csv(tmp_path / "predictions.csv")

    c = cfg.copy()
    c.data.keypoint_names = keypoints
    c.data.num_keypoints = n_keypoints
    c.data.columns_for_singleview_pca = None
    c.data.mirrored_column_matches = None
    result = compute_metrics_single(
        cfg=c, labels_file=tmp_path / "labels.csv",
        preds_file=tmp_path / "predictions.csv",
    )
    assert result.pixel_error_df is not None
    assert result.pixel_error_df.shape == (n_frames, n_keypoints + 1)  # + set
    assert list(result.pixel_error_df.columns[:n_keypoints]) == keypoints


def test_compute_metrics_single_pca_paths(tmp_path, cfg, toy_data_dir):
    """With a data_module and PCA config, labeled metrics include
    pca_singleview/pca_multiview reprojection-error side CSVs
    (reference metrics.py:240-327)."""
    import os

    from lightning_pose_tpu.data.datamodules import BaseDataModule
    from lightning_pose_tpu.data.datasets import HeatmapDataset

    ds = HeatmapDataset(
        root_directory=toy_data_dir, csv_path="CollectedData.csv",
        image_resize_height=128, image_resize_width=128,
        imgaug_pipeline="default",
    )
    dm = BaseDataModule(dataset=ds, train_probability=0.8, torch_seed=0)

    labels_file = os.path.join(toy_data_dir, "CollectedData.csv")
    labels = pd.read_csv(labels_file, header=[0, 1, 2], index_col=0)
    preds_file = tmp_path / "predictions.csv"
    _write_preds_csv(
        preds_file, len(labels), cfg.data.keypoint_names, with_set=True,
        index=labels.index,
    )
    result = metrics.compute_metrics_single(
        cfg=cfg, labels_file=labels_file, preds_file=str(preds_file),
        data_module=dm,
    )
    assert result.pixel_error_df is not None
    assert result.pca_sv_df is not None
    assert result.pca_mv_df is not None
    assert (tmp_path / "predictions_pca_singleview_error.csv").exists()
    assert (tmp_path / "predictions_pca_multiview_error.csv").exists()
    # all keypoint columns present; only the pca subset carries values,
    # the rest stay NaN (reference metrics.py:92-131 fills NaN outside
    # the configured columns)
    kp_cols = [c for c in result.pca_sv_df.columns if c != "set"]
    assert len(kp_cols) == len(cfg.data.keypoint_names)
    arr = result.pca_sv_df[kp_cols].to_numpy()
    subset = list(cfg.data.columns_for_singleview_pca)
    non_subset = [i for i in range(len(kp_cols)) if i not in subset]
    assert not np.isnan(arr[:, subset]).all()
    assert np.isnan(arr[:, non_subset]).all()
