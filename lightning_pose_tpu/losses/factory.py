"""Loss registry and factory (reference lightning_pose/losses/factory.py).

``get_loss_factories(cfg, data_module)`` builds ``{'supervised',
'unsupervised'}`` :class:`LossFactory` objects from the config; the factory
call sums ``anneal_weight * weight * loss`` over registered losses, with
heatmap losses exempt from annealing (reference factory.py:272-279).

Loss instances hold only static hyperparameters (plus PCA device constants),
so a ``LossFactory.__call__`` is traceable inside the jitted train step.
"""

from __future__ import annotations

import logging
from typing import Any

import jax.numpy as jnp
import numpy as np

from lightning_pose_tpu.losses.losses import (
    HeatmapJSLoss,
    PairwiseProjectionsLoss,
    ReprojectionHeatmapLoss,
    HeatmapKLLoss,
    HeatmapMSELoss,
    PCALoss,
    RegressionMSELoss,
    TemporalHeatmapLoss,
    TemporalLoss,
    UnimodalLoss,
)

logger = logging.getLogger(__name__)

__all__ = ["get_loss_classes", "get_loss_factories", "LossFactory"]

# losses never scaled by the anneal weight (reference factory.py:273)
_ANNEAL_EXEMPT = ["heatmap_mse", "heatmap_kl", "heatmap_js"]


def get_loss_classes() -> dict[str, type]:
    """Name -> class registry (reference factory.py:55-76)."""
    return {
        "regression": RegressionMSELoss,
        "heatmap_mse": HeatmapMSELoss,
        "heatmap_kl": HeatmapKLLoss,
        "heatmap_js": HeatmapJSLoss,
        "pca_multiview": PCALoss,
        "pca_singleview": PCALoss,
        "temporal": TemporalLoss,
        "temporal_heatmap_mse": TemporalHeatmapLoss,
        "temporal_heatmap_kl": TemporalHeatmapLoss,
        "unimodal_mse": UnimodalLoss,
        "unimodal_kl": UnimodalLoss,
        "unimodal_js": UnimodalLoss,
        "supervised_pairwise_projections": PairwiseProjectionsLoss,
        "supervised_reprojection_heatmap_mse": ReprojectionHeatmapLoss,
    }


def get_loss_factories(cfg, data_module=None) -> dict[str, "LossFactory"]:
    """Build supervised + unsupervised loss factories from the config
    (reference factory.py:79-200)."""
    loss_params: dict[str, dict[str, dict]] = {"supervised": {}, "unsupervised": {}}

    if "heatmap" in cfg.model.model_type:
        loss_name = "heatmap_" + cfg.model.heatmap_loss_type
        loss_params["supervised"][loss_name] = {"log_weight": 0.0}
        # supervised 3D losses for calibrated multiview models
        # (reference factory.py:102-128)
        dataset_calibrated = bool(
            getattr(getattr(data_module, "dataset", None), "is_calibrated", False)
        )
        if "multiview" in cfg.model.model_type and (
            cfg.data.get("camera_params_file") or dataset_calibrated
        ):
            lw_sp = cfg.losses.get("supervised_pairwise_projections", None)
            if lw_sp is not None and lw_sp.get("log_weight") is not None:
                logger.info("adding supervised pairwise projection loss")
                loss_params["supervised"]["supervised_pairwise_projections"] = {
                    "log_weight": lw_sp.get("log_weight")
                }
            lw_hr = cfg.losses.get("supervised_reprojection_heatmap_mse", None)
            if lw_hr is not None and lw_hr.get("log_weight") is not None:
                logger.info("adding supervised reprojection heatmap loss")
                height_og = cfg.data.image_resize_dims.height
                width_og = cfg.data.image_resize_dims.width
                df = cfg.data.get("downsample_factor", 2)
                loss_params["supervised"]["supervised_reprojection_heatmap_mse"] = {
                    "log_weight": lw_hr.get("log_weight"),
                    "original_image_height": height_og,
                    "original_image_width": width_og,
                    "downsampled_image_height": int(height_og // (2**df)),
                    "downsampled_image_width": int(width_og // (2**df)),
                }
    else:
        loss_params["supervised"][cfg.model.model_type] = {"log_weight": 0.0}
        if cfg.model.model_type == "regression":
            loss_params["supervised"] = {"regression": {"log_weight": 0.0}}

    losses_to_use = cfg.model.get("losses_to_use") or []
    for loss_name in losses_to_use:
        params = dict(cfg.losses[loss_name].to_dict(resolve=True))
        params["loss_name"] = loss_name
        if loss_name.startswith("unimodal") or loss_name.startswith("temporal_heatmap"):
            if cfg.model.model_type == "regression":
                raise NotImplementedError(
                    "unimodal loss can only be used with heatmap models"
                )
            height_og = cfg.data.image_resize_dims.height
            width_og = cfg.data.image_resize_dims.width
            df = cfg.data.get("downsample_factor", 2)
            params["original_image_height"] = height_og
            params["original_image_width"] = width_og
            params["downsampled_image_height"] = int(height_og // (2**df))
            params["downsampled_image_width"] = int(width_og // (2**df))
        elif loss_name == "pca_multiview":
            view_names = cfg.data.get("view_names", None)
            matches = cfg.data.mirrored_column_matches
            if view_names and len(view_names) > 1 and isinstance(matches[0], int):
                # true-multiview expansion (reference factory.py:159-176)
                num_keypoints = cfg.data.num_keypoints
                params["mirrored_column_matches"] = [
                    (v * num_keypoints + np.array(matches, dtype=int)).tolist()
                    for v in range(len(view_names))
                ]
            else:
                params["mirrored_column_matches"] = matches
        elif loss_name == "pca_singleview":
            if cfg.data.get("view_names", None) and len(cfg.data.view_names) > 1:
                raise NotImplementedError(
                    "The Pose PCA loss is currently not implemented for multiview data."
                )
            params["columns_for_singleview_pca"] = cfg.data.get(
                "columns_for_singleview_pca", None
            )
        loss_params["unsupervised"][loss_name] = params

    return {
        "supervised": LossFactory(loss_params["supervised"], data_module=data_module),
        "unsupervised": LossFactory(
            loss_params["unsupervised"], data_module=data_module
        ),
    }


class LossFactory:
    """Holds loss instances and sums their weighted values
    (reference factory.py:203-291)."""

    def __init__(self, losses_params_dict: dict[str, dict], data_module=None) -> None:
        self.losses_params_dict = losses_params_dict
        self.data_module = data_module
        self.loss_instance_dict: dict[str, Any] = {}
        classes = get_loss_classes()
        for loss_name, params in losses_params_dict.items():
            params = dict(params)
            if loss_name.startswith("pca"):
                # PCA losses need a fitted subspace from the training data
                from lightning_pose_tpu.utils.pca import KeypointPCA

                assert data_module is not None, "PCA loss requires a data_module"
                pca = KeypointPCA(
                    loss_type=loss_name,
                    data_module=data_module,
                    components_to_keep=params.pop("components_to_keep", 0.95),
                    empirical_epsilon_percentile=params.pop(
                        "empirical_epsilon_percentile", 99.0
                    ),
                    mirrored_column_matches=params.pop("mirrored_column_matches", None),
                    columns_for_singleview_pca=params.pop(
                        "columns_for_singleview_pca", None
                    ),
                    centering_method=params.pop("centering_method", None),
                )
                pca()
                params["pca"] = pca
            self.loss_instance_dict[loss_name] = classes[loss_name](**params)

    def __call__(
        self,
        stage: str | None = None,
        anneal_weight: Any = 1.0,
        **kwargs: Any,
    ) -> tuple[Any, dict[str, Any]]:
        """Total weighted loss + flat logging dict."""
        tot_loss = jnp.float32(0.0)
        logs: dict[str, Any] = {}
        for loss_name, loss_instance in self.loss_instance_dict.items():
            curr_loss, loss_logs = loss_instance(stage=stage, **kwargs)
            weighted = loss_instance.weight * curr_loss
            if anneal_weight is None or loss_name in _ANNEAL_EXEMPT:
                scaled = weighted
            else:
                scaled = anneal_weight * weighted
            tot_loss = tot_loss + scaled
            logs.update(loss_logs)
            logs[f"{stage}_{loss_name}_loss_weighted"] = weighted
        return tot_loss, logs
