"""Dataset / data-module factory dispatch tests
(reference tests/data/test_factory.py:1-383)."""

from pathlib import Path

import numpy as np
import pytest

from lightning_pose_tpu.data.datamodules import BaseDataModule
from lightning_pose_tpu.data.datasets import BaseTrackingDataset, HeatmapDataset
from lightning_pose_tpu.data.factory import (
    get_data_module,
    get_dataset,
    get_imgaug_pipeline,
)


def test_imgaug_pipeline_presets(cfg):
    c = cfg.copy()
    for preset in ["default", "none", "dlc", "dlc-lr", "dlc-top-down", "dlc-mv"]:
        c.training.imgaug = preset
        assert get_imgaug_pipeline(c) == preset


def test_imgaug_pipeline_invalid_preset_raises(cfg):
    c = cfg.copy()
    c.training.imgaug = "not-a-preset"
    with pytest.raises(NotImplementedError, match="not-a-preset"):
        get_imgaug_pipeline(c)


def test_imgaug_pipeline_dict_passthrough(cfg):
    c = cfg.copy()
    c.training.imgaug = {"Affine": {"p": 0.5, "kwargs": {"rotate": [-10, 10]}}}
    spec = get_imgaug_pipeline(c)
    assert isinstance(spec, dict)
    assert "Affine" in spec


def test_get_dataset_dispatch_regression(cfg, toy_data_dir):
    c = cfg.copy()
    c.model.model_type = "regression"
    ds = get_dataset(c, toy_data_dir)
    assert type(ds) is BaseTrackingDataset
    assert not ds.do_context


def test_get_dataset_dispatch_heatmap(cfg, toy_data_dir):
    ds = get_dataset(cfg, toy_data_dir)
    assert isinstance(ds, HeatmapDataset)
    assert not ds.do_context
    # downsample_factor=2: heatmap dims = resize / 4
    assert ds.output_shape == (
        cfg.data.image_resize_dims.height // 4,
        cfg.data.image_resize_dims.width // 4,
    )


def test_get_dataset_dispatch_mhcrnn_context(cfg, toy_data_dir):
    c = cfg.copy()
    c.model.model_type = "heatmap_mhcrnn"
    ds = get_dataset(c, toy_data_dir)
    assert isinstance(ds, HeatmapDataset)
    assert ds.do_context


def test_get_dataset_dispatch_multiview(cfg, mv_data_dir):
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    c = cfg.copy()
    c.model.model_type = "heatmap_multiview"
    c.data.data_dir = mv_data_dir
    c.data.view_names = ["top", "bot"]
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = [
        "paw1LH", "paw2LF", "paw3RF", "paw4RH", "tailBase", "tailMid", "nose",
    ]
    c.data.mirrored_column_matches = None
    c.data.columns_for_singleview_pca = None
    ds = get_dataset(c, mv_data_dir)
    assert isinstance(ds, MultiviewHeatmapDataset)


def test_get_dataset_dispatch_heatmap_on_multiview_data(cfg, mv_data_dir):
    """model_type=heatmap with view_names -> multiview dataset, no context
    (reference data/factory.py:152-185 dispatches any heatmap* model with
    multiple views to MultiviewHeatmapDataset)."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    c = cfg.copy()
    c.model.model_type = "heatmap"
    c.data.data_dir = mv_data_dir
    c.data.view_names = ["top", "bot"]
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = None
    c.data.mirrored_column_matches = None
    c.data.columns_for_singleview_pca = None
    ds = get_dataset(c, mv_data_dir)
    assert isinstance(ds, MultiviewHeatmapDataset)
    assert not ds.do_context


def test_get_dataset_regression_multiview_raises(cfg, mv_data_dir):
    """Multi-view support is heatmap-only (reference data/factory.py:138)."""
    c = cfg.copy()
    c.model.model_type = "regression"
    c.data.view_names = ["top", "bot"]
    c.data.csv_file = ["top.csv", "bot.csv"]
    with pytest.raises(NotImplementedError, match="heatmap-based"):
        get_dataset(c, mv_data_dir)


def test_get_dataset_invalid_type_raises(cfg, toy_data_dir):
    c = cfg.copy()
    c.model.model_type = "not_a_model"
    with pytest.raises((NotImplementedError, ValueError)):
        get_dataset(c, toy_data_dir)


def test_get_data_module_supervised(cfg, toy_data_dir):
    ds = get_dataset(cfg, toy_data_dir)
    dm = get_data_module(cfg, ds)
    assert type(dm) is BaseDataModule
    assert dm.train_batch_size == cfg.training.train_batch_size


def test_get_data_module_semisupervised(cfg, toy_data_dir):
    from lightning_pose_tpu.data.unlabeled import UnlabeledDataModule

    c = cfg.copy()
    c.model.losses_to_use = ["temporal"]
    ds = get_dataset(c, toy_data_dir)
    dm = get_data_module(c, ds, video_dir=c.data.video_dir)
    assert isinstance(dm, UnlabeledDataModule)


def test_get_data_module_empty_losses_is_supervised(cfg, toy_data_dir):
    """losses_to_use=[] means fully supervised (reference
    models/factory.py check_if_semi_supervised semantics)."""
    c = cfg.copy()
    c.model.losses_to_use = []
    ds = get_dataset(c, toy_data_dir)
    dm = get_data_module(c, ds)
    assert type(dm) is BaseDataModule


def test_unknown_augmentation_name_raises(cfg):
    """A typo'd transform name fails fast instead of silently training
    under a different distribution (reference test_factory.py:181-187)."""
    from lightning_pose_tpu.ops.augment import build_spec

    with pytest.raises(NotImplementedError, match="unsupported augmentation"):
        build_spec({"ResizeD": {"p": 1.0}})


def test_bbox_path_default_none(cfg, toy_data_dir):
    dataset = get_dataset(cfg, toy_data_dir)
    assert dataset.bboxes is None


def test_bbox_path_forwarded_from_config(cfg, toy_data_dir, tmp_path):
    """data.bbox_file reaches the dataset for heatmap and regression
    (reference test_factory.py:334-377)."""
    import pandas as pd

    from lightning_pose_tpu.utils.io import parse_label_csv

    labeled = parse_label_csv(str(Path(toy_data_dir) / "CollectedData.csv"))
    bbox_df = pd.DataFrame(
        {
            "x": 0.0,
            "y": 0.0,
            "h": 406.0,
            "w": 396.0,
        },
        index=labeled.image_names,
    )
    bbox_csv = tmp_path / "bboxes.csv"
    bbox_df.to_csv(bbox_csv)
    for model_type in ["heatmap", "regression"]:
        c = cfg.copy()
        c.model.model_type = model_type
        c.data.bbox_file = str(bbox_csv)
        dataset = get_dataset(c, toy_data_dir)
        assert dataset.bboxes is not None
        assert dataset.bboxes.shape == (len(labeled.image_names), 4)
        sample = dataset[0]
        assert "bbox" in sample
        np.testing.assert_allclose(
            np.asarray(sample["bbox"]), [0.0, 0.0, 406.0, 396.0]
        )
