"""Typed batch contracts (reference lightning_pose/data/datatypes.py:33-257).

The TPU build moves batches as plain dicts of numpy/jnp arrays (pytrees);
these TypedDicts document the exact schema at each pipeline boundary and
give static type checkers the same contracts the reference encodes.

Layout note: images are channels-last here (NHWC) vs the reference's NCHW.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TypedDict

import numpy as np
import pandas as pd

__all__ = [
    "BaseLabeledExampleDict",
    "HeatmapLabeledBatchDict",
    "MultiviewHeatmapLabeledBatchDict",
    "UnlabeledBatchDict",
    "MultiviewUnlabeledBatchDict",
    "SemiSupervisedBatchDict",
    "PredictionResult",
    "MultiviewPredictionResult",
]


class BaseLabeledExampleDict(TypedDict, total=False):
    """One labeled example (reference datatypes.py:112)."""

    images: np.ndarray  # (H, W, 3) uint8 or (T, H, W, 3) for context
    keypoints: np.ndarray  # (K, 2) float32, resized-image coords
    visibility: np.ndarray  # (K,) int64 in {0, 1, 2}
    bbox: np.ndarray  # (4,) [x, y, h, w] in original-frame coords
    idx: int


class HeatmapLabeledBatchDict(TypedDict, total=False):
    """Collated labeled batch (reference datatypes.py:124).

    Target heatmaps are NOT carried in the batch: they are generated on
    device inside the jitted train step.
    """

    images: np.ndarray  # (B, H, W, 3) or (B, T, H, W, 3)
    keypoints: np.ndarray  # (B, K, 2)
    visibility: np.ndarray  # (B, K)
    bbox: np.ndarray  # (B, 4)
    idxs: np.ndarray  # (B,)
    valid: np.ndarray  # (B,) bool — False rows are padding


class MultiviewHeatmapLabeledBatchDict(TypedDict, total=False):
    """Multiview labeled batch (reference datatypes.py:158)."""

    images: np.ndarray  # (B, V, H, W, 3)
    keypoints: np.ndarray  # (B, V*K, 2) view-major
    visibility: np.ndarray  # (B, V*K)
    bbox: np.ndarray  # (B, V*4)
    idxs: np.ndarray
    valid: np.ndarray
    num_views: np.ndarray
    intrinsic_matrix: np.ndarray  # (B, V, 3, 3) when calibrated
    extrinsic_matrix: np.ndarray  # (B, V, 3, 4)
    distortions: np.ndarray  # (B, V, 5)


class UnlabeledBatchDict(TypedDict, total=False):
    """Unlabeled video window (reference datatypes.py:206)."""

    frames: np.ndarray  # (T, H, W, 3) uint8 resized frames
    bbox: np.ndarray  # (T, 4) full-frame bbox in original video resolution
    transforms: np.ndarray  # (T, 2, 3) forward augmentation matrices


class MultiviewUnlabeledBatchDict(TypedDict, total=False):
    """Per-view unlabeled windows, frame-synchronized
    (reference datatypes.py:227)."""

    frames: np.ndarray  # (T, V, H, W, 3)
    bbox: np.ndarray  # (T, V*4)
    transforms: np.ndarray  # (T, V, 2, 3)
    is_multiview: bool


class SemiSupervisedBatchDict(TypedDict, total=False):
    """Combined labeled + unlabeled step input (reference datatypes.py:246)."""

    images: np.ndarray
    keypoints: np.ndarray
    visibility: np.ndarray
    bbox: np.ndarray
    unlabeled: UnlabeledBatchDict


@dataclass
class PredictionResult:
    """Result of a prediction call (reference datatypes.py:34-76).

    ``metrics`` is a ``ComputeMetricsSingleResult`` (see
    :mod:`lightning_pose_tpu.metrics`) or None when metrics were not
    computed.
    """

    predictions: pd.DataFrame
    metrics: object | None = field(default=None)

    def to_dict(self) -> dict:
        """Predictions + metrics as a flat dict of named numpy arrays, all
        shaped ``(n_frames, n_keypoints)`` with shared row order (reference
        datatypes.py:40-76). Metric entries are None when not computed."""

        def _metric(df: pd.DataFrame | None) -> np.ndarray | None:
            if df is None:
                return None
            cols = [c for c in df.columns if c != "set"]
            return df[cols].to_numpy()

        m = self.metrics
        preds = self.predictions
        return {
            "keypoint_names": list(preds.columns.get_level_values(1).unique()),
            "index": list(preds.index),
            "x": preds.xs("x", level=2, axis=1).to_numpy(),
            "y": preds.xs("y", level=2, axis=1).to_numpy(),
            "confidence": preds.xs("likelihood", level=2, axis=1).to_numpy(),
            "pixel_error": _metric(getattr(m, "pixel_error_df", None)) if m else None,
            "temporal_norm": _metric(getattr(m, "temporal_norm_df", None)) if m else None,
            "pca_singleview_error": _metric(getattr(m, "pca_sv_df", None)) if m else None,
            "pca_multiview_error": _metric(getattr(m, "pca_mv_df", None)) if m else None,
        }


@dataclass
class MultiviewPredictionResult:
    """Per-view prediction dataframes (reference datatypes.py:79-100)."""

    predictions: dict[str, pd.DataFrame]
    metrics: dict[str, object] | None = field(default=None)

    def to_dict(self) -> dict:
        """Per-view :meth:`PredictionResult.to_dict` outputs, keyed by view
        name (reference datatypes.py:85-100)."""
        return {
            view: PredictionResult(
                predictions=df,
                metrics=self.metrics.get(view) if self.metrics else None,
            ).to_dict()
            for view, df in self.predictions.items()
        }
