"""Loss layer: stateless jitted loss functions plus a factory/registry."""

from lightning_pose_tpu.losses.losses import (
    HeatmapJSLoss,
    PairwiseProjectionsLoss,
    ReprojectionHeatmapLoss,
    HeatmapKLLoss,
    HeatmapMSELoss,
    Loss,
    PCALoss,
    RegressionMSELoss,
    RegressionRMSELoss,
    TemporalHeatmapLoss,
    TemporalLoss,
    UnimodalLoss,
)

__all__ = [
    "Loss",
    "HeatmapMSELoss",
    "HeatmapKLLoss",
    "HeatmapJSLoss",
    "PCALoss",
    "TemporalLoss",
    "TemporalHeatmapLoss",
    "UnimodalLoss",
    "RegressionMSELoss",
    "RegressionRMSELoss",
    "PairwiseProjectionsLoss",
    "ReprojectionHeatmapLoss",
]
