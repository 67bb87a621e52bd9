"""Prediction heads: heatmap, temporal-context (CRNN), regression."""

from lightning_pose_tpu.models.heads.heatmap import HeatmapHead
from lightning_pose_tpu.models.heads.regression import LinearRegressionHead

__all__ = ["HeatmapHead", "LinearRegressionHead"]
