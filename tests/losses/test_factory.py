"""Tests for the loss factory (registry, weighting, anneal exemption)."""

import numpy as np
import pytest

from lightning_pose_tpu.data.heatmaps import generate_heatmaps
from lightning_pose_tpu.losses.factory import (
    LossFactory,
    get_loss_classes,
    get_loss_factories,
)


def test_registry_names():
    classes = get_loss_classes()
    for name in [
        "regression", "heatmap_mse", "heatmap_kl", "heatmap_js",
        "pca_multiview", "pca_singleview", "temporal",
        "temporal_heatmap_mse", "temporal_heatmap_kl",
        "unimodal_mse", "unimodal_kl", "unimodal_js",
        "supervised_pairwise_projections",
        "supervised_reprojection_heatmap_mse",
    ]:
        assert name in classes, name


def test_supervised_factory_from_cfg(cfg):
    factories = get_loss_factories(cfg)
    sup = factories["supervised"]
    assert list(sup.loss_instance_dict.keys()) == ["heatmap_mse"]
    # log_weight 0 -> weight 1/2
    assert sup.loss_instance_dict["heatmap_mse"].weight == pytest.approx(0.5)


def test_heatmap_loss_type_dispatch(cfg):
    c = cfg.copy()
    c.model.heatmap_loss_type = "kl"
    factories = get_loss_factories(c)
    assert "heatmap_kl" in factories["supervised"].loss_instance_dict


def test_factory_call_sums_weighted(rng):
    factory = LossFactory({"heatmap_mse": {"log_weight": 0.0}})
    kps = rng.uniform(10, 110, size=(2, 3, 2)).astype(np.float32)
    hm = np.asarray(generate_heatmaps(kps, 128, 128, (32, 32)))
    pred = np.roll(hm, 2, axis=1)
    total, logs = factory(
        stage="train", anneal_weight=None, heatmaps_targ=hm, heatmaps_pred=pred
    )
    # total = 0.5 * raw loss
    raw = logs["train_heatmap_mse_loss"]
    assert float(total) == pytest.approx(0.5 * float(raw), rel=1e-5)
    assert "train_heatmap_mse_loss_weighted" in logs


def test_anneal_weight_applies_to_unsupervised_only(rng):
    from lightning_pose_tpu.losses.losses import TemporalLoss

    factory = LossFactory({})
    factory.loss_instance_dict = {"temporal": TemporalLoss(log_weight=0.0)}
    preds = np.zeros((3, 2), dtype=np.float32)
    preds[1] = [3.0, 4.0]
    total_full, _ = factory(stage="train", anneal_weight=1.0, keypoints_pred=preds)
    total_half, _ = factory(stage="train", anneal_weight=0.5, keypoints_pred=preds)
    assert float(total_half) == pytest.approx(0.5 * float(total_full), rel=1e-5)

    # heatmap losses are exempt from annealing (reference factory.py:273)
    from lightning_pose_tpu.losses.losses import HeatmapMSELoss

    f2 = LossFactory({})
    f2.loss_instance_dict = {"heatmap_mse": HeatmapMSELoss()}
    kps = np.random.default_rng(0).uniform(10, 110, (2, 3, 2)).astype(np.float32)
    hm = np.asarray(generate_heatmaps(kps, 128, 128, (32, 32)))
    pred = np.roll(hm, 2, axis=1)
    t1, _ = f2(stage="train", anneal_weight=0.0, heatmaps_targ=hm, heatmaps_pred=pred)
    t2, _ = f2(stage="train", anneal_weight=1.0, heatmaps_targ=hm, heatmaps_pred=pred)
    assert float(t1) == pytest.approx(float(t2), rel=1e-6)


def test_pca_singleview_multiview_conflict(cfg):
    c = cfg.copy()
    c.data.view_names = ["a", "b"]
    c.model.losses_to_use = ["pca_singleview"]
    with pytest.raises(NotImplementedError):
        get_loss_factories(c)


def test_regression_model_rejects_unimodal(cfg):
    c = cfg.copy()
    c.model.model_type = "regression"
    c.model.losses_to_use = ["unimodal_mse"]
    with pytest.raises(NotImplementedError):
        get_loss_factories(c)
