"""Evaluation metrics + per-prediction-file metric CSVs
(reference lightning_pose/metrics.py).

CSV conventions match the reference exactly: predictions CSVs carry a
3-level (scorer/bodyparts/coords) header with x/y/likelihood columns and an
optional trailing ``set`` column marking labeled-dataset files; metric side
files are written next to the predictions as ``<stem>_<metric>.csv``.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pandas as pd

from lightning_pose_tpu.utils.io import fix_empty_first_row, get_keypoint_names
from lightning_pose_tpu.utils.pca import KeypointPCA

logger = logging.getLogger(__name__)

__all__ = [
    "pixel_error",
    "temporal_norm",
    "pca_singleview_reprojection_error",
    "pca_multiview_reprojection_error",
    "compute_metrics_single",
    "ComputeMetricsSingleResult",
]


def pixel_error(keypoints_true: np.ndarray, keypoints_pred: np.ndarray) -> np.ndarray:
    """L2 error per keypoint; shapes (samples, K, 2) -> (samples, K)
    (reference metrics.py:47)."""
    return np.linalg.norm(keypoints_true - keypoints_pred, axis=2)


def temporal_norm(keypoints_pred: np.ndarray) -> np.ndarray:
    """Frame-to-frame L2 norm per keypoint, NaN first row
    (reference metrics.py:62)."""
    kp = np.asarray(keypoints_pred, dtype=np.float32)
    if kp.ndim != 2:
        kp = kp.reshape(kp.shape[0], -1)
    diffs = np.diff(kp, axis=0).reshape(kp.shape[0] - 1, -1, 2)
    t_norm = np.linalg.norm(diffs, axis=2)
    return np.vstack([np.nan * np.zeros((1, t_norm.shape[1])), t_norm])


def pca_singleview_reprojection_error(
    keypoints_pred: np.ndarray, pca: KeypointPCA
) -> np.ndarray:
    """(samples, K, 2) -> (samples, K); NaN for keypoints excluded from PCA
    (reference metrics.py:92)."""
    kp = np.asarray(keypoints_pred, dtype=np.float32)
    original_dims = kp.shape
    pca_cols = pca.columns_for_singleview_pca
    data_arr = pca._format_data(kp.reshape(kp.shape[0], -1))
    reproj = pca.reproject(data_arr)
    kp_reproj = reproj.reshape(reproj.shape[0], -1, 2)
    if pca_cols is None:
        pca_cols = list(range(original_dims[1]))
    error_pca = pixel_error(kp[:, np.array(pca_cols), :], kp_reproj)
    error_all = np.nan * np.zeros((original_dims[0], original_dims[1]))
    error_all[:, np.array(pca_cols)] = error_pca
    return error_all


def pca_multiview_reprojection_error(
    keypoints_pred: np.ndarray, pca: KeypointPCA
) -> np.ndarray:
    """(samples, K, 2) -> (samples, K); NaN for unmatched keypoints
    (reference metrics.py:134)."""
    kp = np.asarray(keypoints_pred, dtype=np.float32)
    original_dims = kp.shape
    assert pca.mirrored_column_matches is not None
    matches = list(pca.mirrored_column_matches)
    data_arr = pca._format_data(kp.reshape(kp.shape[0], -1))
    reproj = pca.reproject(data_arr)
    kp_reproj = reproj.reshape(reproj.shape[0], -1, 2)
    kp_reformat = pca._format_data(kp.reshape(kp.shape[0], -1))
    kp_reformat = kp_reformat.reshape(kp_reformat.shape[0], -1, 2)
    error_pca = pixel_error(kp_reformat, kp_reproj)
    error_pca = error_pca.reshape(-1, len(matches[0]), len(matches))
    error_all = np.nan * np.zeros((original_dims[0], original_dims[1]))
    for c, cols in enumerate(matches):
        error_all[:, np.array(cols)] = error_pca[:, :, c]
    return error_all


@dataclass
class ComputeMetricsSingleResult:
    """Container for metric dataframes (reference data/datatypes.py)."""

    pixel_error_df: pd.DataFrame | None = field(default=None)
    temporal_norm_df: pd.DataFrame | None = field(default=None)
    pca_sv_df: pd.DataFrame | None = field(default=None)
    pca_mv_df: pd.DataFrame | None = field(default=None)


def compute_metrics_single(
    cfg,
    labels_file: str | Path | None,
    preds_file: str | Path,
    data_module=None,
) -> ComputeMetricsSingleResult:
    """Compute metrics for a single-view predictions CSV and write side files
    (reference metrics.py:187-327)."""
    pred_df = pd.read_csv(preds_file, header=[0, 1, 2], index_col=0)
    keypoint_names = get_keypoint_names(
        cfg, csv_file=str(preds_file), header_rows=[0, 1, 2]
    )
    xyl_mask = pred_df.columns.get_level_values("coords").isin(
        ["x", "y", "likelihood"]
    )
    tmp = pred_df.loc[:, xyl_mask].to_numpy().reshape(pred_df.shape[0], -1, 3)

    index = pred_df.index
    if pred_df.keys()[-1][0] == "set":
        is_video = False
        set_col = pred_df.iloc[:, -1].to_numpy()
    else:
        is_video = True
        set_col = None

    keypoints_pred = tmp[:, :, :2]

    metrics_to_compute = ["temporal"] if is_video else ["pixel_error"]
    is_multiview_dataset = (
        data_module is not None
        and getattr(data_module.dataset, "view_names", None) is not None
    )
    if (
        data_module is not None
        and cfg.data.get("columns_for_singleview_pca", None) is not None
        and len(cfg.data.columns_for_singleview_pca) != 0
        and not is_multiview_dataset
    ):
        metrics_to_compute += ["pca_singleview"]
    if (
        data_module is not None
        and cfg.data.get("mirrored_column_matches", None) is not None
        and len(cfg.data.mirrored_column_matches) != 0
        and not is_multiview_dataset
    ):
        metrics_to_compute += ["pca_multiview"]

    result = ComputeMetricsSingleResult()
    preds_file_path = Path(preds_file)

    def _save(df: pd.DataFrame, suffix: str) -> None:
        if set_col is not None:
            df["set"] = set_col
        save_file = preds_file_path.with_name(preds_file_path.stem + suffix)
        df.to_csv(save_file)

    if "pixel_error" in metrics_to_compute:
        assert labels_file is not None, '"pixel_error" metric requires labels_file'
        labels_df = pd.read_csv(labels_file, header=[0, 1, 2], index_col=0)
        labels_df = fix_empty_first_row(labels_df)
        assert labels_df.index.equals(index)
        xy_mask = labels_df.columns.get_level_values("coords").isin(["x", "y"])
        labels_df = labels_df.loc[:, xy_mask]
        keypoints_true = labels_df.to_numpy().reshape(labels_df.shape[0], -1, 2)
        error_df = pd.DataFrame(
            pixel_error(keypoints_true, keypoints_pred),
            index=pd.Index(index),
            columns=pd.Index(keypoint_names),
        )
        _save(error_df, "_pixel_error.csv")
        result.pixel_error_df = error_df

    if "temporal" in metrics_to_compute:
        t_df = pd.DataFrame(
            temporal_norm(keypoints_pred),
            index=pd.Index(index),
            columns=pd.Index(keypoint_names),
        )
        _save(t_df, "_temporal_norm.csv")
        result.temporal_norm_df = t_df

    if "pca_singleview" in metrics_to_compute:
        try:
            pca = KeypointPCA(
                loss_type="pca_singleview",
                data_module=data_module,
                components_to_keep=cfg.losses.pca_singleview.components_to_keep,
                empirical_epsilon_percentile=cfg.losses.pca_singleview.get(
                    "empirical_epsilon_percentile", 1.0
                ),
                columns_for_singleview_pca=cfg.data.columns_for_singleview_pca,
                centering_method=cfg.losses.pca_singleview.get(
                    "centering_method", None
                ),
            )
            pca()
            df = pd.DataFrame(
                pca_singleview_reprojection_error(keypoints_pred, pca),
                index=pd.Index(index),
                columns=pd.Index(keypoint_names),
            )
            _save(df, "_pca_singleview_error.csv")
            result.pca_sv_df = df
        except ValueError as e:
            if "cannot fit PCA" not in str(e):
                raise e

    if "pca_multiview" in metrics_to_compute:
        try:
            pca = KeypointPCA(
                loss_type="pca_multiview",
                data_module=data_module,
                components_to_keep=cfg.losses.pca_singleview.components_to_keep,
                empirical_epsilon_percentile=cfg.losses.pca_singleview.get(
                    "empirical_epsilon_percentile", 1.0
                ),
                mirrored_column_matches=cfg.data.mirrored_column_matches,
            )
            pca()
            df = pd.DataFrame(
                pca_multiview_reprojection_error(keypoints_pred, pca),
                index=pd.Index(index),
                columns=pd.Index(keypoint_names),
            )
            _save(df, "_pca_multiview_error.csv")
            result.pca_mv_df = df
        except ValueError as e:
            if "cannot fit PCA" not in str(e):
                raise e

    return result
