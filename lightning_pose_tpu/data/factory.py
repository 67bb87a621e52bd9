"""Dataset / data-module factories dispatching on the config
(reference lightning_pose/data/factory.py:47-319)."""

from __future__ import annotations

import logging

from lightning_pose_tpu.data.datamodules import BaseDataModule
from lightning_pose_tpu.data.datasets import BaseTrackingDataset, HeatmapDataset

logger = logging.getLogger(__name__)

__all__ = ["get_imgaug_pipeline", "get_dataset", "get_data_module"]


def get_imgaug_pipeline(cfg) -> str | dict:
    """Resolve the augmentation spec: a preset string or a per-transform dict
    (reference data/factory.py:47-100 + augmentations.py:109)."""
    aug = cfg.training.get("imgaug", "default")
    if isinstance(aug, str):
        allowed = ["default", "none", "dlc", "dlc-lr", "dlc-top-down", "dlc-mv"]
        if aug not in allowed:
            raise NotImplementedError(
                f"cfg.training.imgaug string {aug} must be in {allowed}"
            )
        return aug
    return aug.to_dict(resolve=True) if hasattr(aug, "to_dict") else dict(aug)


def get_dataset(cfg, data_dir: str, imgaug_pipeline=None):
    """Build the dataset for the configured model type
    (reference data/factory.py:103-202)."""
    if imgaug_pipeline is None:
        imgaug_pipeline = get_imgaug_pipeline(cfg)

    from lightning_pose_tpu.models.factory import normalize_model_type

    model_type = normalize_model_type(cfg.model.model_type)
    height = cfg.data.image_resize_dims.height
    width = cfg.data.image_resize_dims.width
    common = dict(
        root_directory=data_dir,
        csv_path=cfg.data.csv_file,
        image_resize_height=height,
        image_resize_width=width,
        imgaug_pipeline=imgaug_pipeline,
        imgaug_hflip=bool(cfg.training.get("imgaug_hflip", False)),
        bbox_path=cfg.data.get("bbox_file", None),
        uniform_heatmaps_for_nan_keypoints=bool(
            cfg.training.get("uniform_heatmaps_for_nan_keypoints", False)
        ),
    )

    view_names = cfg.data.get("view_names", None)
    is_multiview_data = bool(view_names) and len(view_names) > 1
    if model_type == "regression":
        if is_multiview_data:
            raise NotImplementedError(
                "Multi-view support only available for heatmap-based models"
            )
        return BaseTrackingDataset(do_context=False, **common)
    if model_type == "heatmap":
        if is_multiview_data:
            # plain heatmap tracker on multiview data: fused per-view
            # samples, views fold into the batch at the model (reference
            # data/factory.py:152-185 dispatches any heatmap* model with
            # view_names to MultiviewHeatmapDataset)
            from lightning_pose_tpu.data.datasets_multiview import (
                MultiviewHeatmapDataset,
            )

            return MultiviewHeatmapDataset(
                cfg=cfg, data_dir=data_dir, imgaug_pipeline=imgaug_pipeline,
                do_context=False,
            )
        return HeatmapDataset(
            do_context=False,
            downsample_factor=int(cfg.data.get("downsample_factor", 2)),
            **common,
        )
    if model_type == "heatmap_mhcrnn":
        if is_multiview_data:
            # context on multiview data: per-view 5-frame stacks fused to
            # (V, 5, H, W, 3) (reference data/factory.py:179 wires
            # do_context for mhcrnn into MultiviewHeatmapDataset)
            from lightning_pose_tpu.data.datasets_multiview import (
                MultiviewHeatmapDataset,
            )

            return MultiviewHeatmapDataset(
                cfg=cfg, data_dir=data_dir, imgaug_pipeline=imgaug_pipeline,
                do_context=True,
            )
        return HeatmapDataset(
            do_context=True,
            downsample_factor=int(cfg.data.get("downsample_factor", 2)),
            # "repeat_center" for datasets whose labeled frames are sparse
            # video samples, where index-adjacent files are not temporal
            # neighbors (see docs/architecture.md, mhcrnn root-cause)
            context_mode=cfg.model.get("mhcrnn_context_mode", "adjacent"),
            **common,
        )
    if model_type == "heatmap_multiview":
        from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

        return MultiviewHeatmapDataset(cfg=cfg, data_dir=data_dir,
                                       imgaug_pipeline=imgaug_pipeline)
    raise NotImplementedError(f"invalid model_type: {model_type}")


def get_data_module(cfg, dataset, video_dir: str | None = None):
    """Build the data module; semi-supervised configs add the unlabeled
    video stream (reference data/factory.py:205-319)."""
    from lightning_pose_tpu.models.factory import check_if_semi_supervised

    semi_supervised = check_if_semi_supervised(cfg.model.get("losses_to_use"))
    common = dict(
        dataset=dataset,
        train_batch_size=cfg.training.train_batch_size,
        val_batch_size=cfg.training.val_batch_size,
        test_batch_size=cfg.training.test_batch_size,
        train_probability=cfg.training.train_prob,
        val_probability=cfg.training.get("val_prob", None),
        train_frames=cfg.training.get("train_frames", None),
        torch_seed=cfg.training.get("rng_seed_data_pt", 42),
    )
    if not semi_supervised:
        return BaseDataModule(**common)

    from lightning_pose_tpu.data.unlabeled import UnlabeledDataModule

    return UnlabeledDataModule(cfg=cfg, video_dir=video_dir, **common)
