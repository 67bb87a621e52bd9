"""Tests for LR / anneal schedules (mirroring reference
tests/test_training/test_lr.py semantics)."""

import numpy as np
import pytest

from lightning_pose_tpu.train.schedules import anneal_weight, backbone_lr, multistep_lr


def test_multistep_lr():
    sched = multistep_lr(1e-3, milestones=[2, 4], gamma=0.5, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(19)) == pytest.approx(1e-3)
    assert float(sched(20)) == pytest.approx(5e-4)  # epoch 2
    assert float(sched(39)) == pytest.approx(5e-4)
    assert float(sched(40)) == pytest.approx(2.5e-4)  # epoch 4


def test_backbone_lr_freeze_then_warmup():
    """0 before unfreeze; 0.1x head at unfreeze; x1.5/epoch until caught up
    (reference callbacks.py:142-188)."""
    spe = 10
    sched = backbone_lr(
        1e-3, milestones=[], gamma=0.5, steps_per_epoch=spe, unfreezing_epoch=3
    )
    assert float(sched(0)) == 0.0
    assert float(sched(2 * spe + 9)) == 0.0  # last step of epoch 2
    assert float(sched(3 * spe)) == pytest.approx(1e-4)  # 0.1 * head lr
    assert float(sched(4 * spe)) == pytest.approx(1.5e-4)
    assert float(sched(5 * spe)) == pytest.approx(2.25e-4)
    # eventually capped at head lr
    assert float(sched(30 * spe)) == pytest.approx(1e-3)


def test_backbone_lr_respects_milestones_after_warmup():
    spe = 10
    sched = backbone_lr(
        1e-3, milestones=[20], gamma=0.5, steps_per_epoch=spe, unfreezing_epoch=0
    )
    # warmed up well before epoch 20; then tracks head lr drop
    assert float(sched(19 * spe)) == pytest.approx(1e-3)
    assert float(sched(20 * spe)) == pytest.approx(5e-4)


def test_backbone_lr_step_mode():
    sched = backbone_lr(
        1e-3, milestones=[], gamma=0.5, steps_per_epoch=1, unfreezing_step=100
    )
    assert float(sched(99)) == 0.0
    assert float(sched(100)) == pytest.approx(1e-4)


def test_patch_mask_schedule_reference_schema():
    """training.patch_mask resolves with epoch->step conversion, reference
    step defaults, final_ratio=0 disabling, and the legacy
    callbacks.patch_masking alias (reference train.py:335-340,
    callbacks.py:227-259)."""
    from lightning_pose_tpu.config import Config
    from lightning_pose_tpu.train.trainer import _patch_mask_schedule

    def cfg_of(training=None, callbacks=None):
        return Config({"training": training or {}, "callbacks": callbacks or {}})

    # epoch schema converts at steps_per_epoch
    pm = _patch_mask_schedule(
        cfg_of(training={"patch_mask": {
            "init_epoch": 40, "final_epoch": 300,
            "init_ratio": 0.0, "final_ratio": 0.5,
        }}),
        steps_per_epoch=10,
    )
    assert pm == (0.0, 0.5, 400, 3000)

    # step schema used directly; reference PatchMasker defaults 700/5000
    pm = _patch_mask_schedule(
        cfg_of(training={"patch_mask": {"init_ratio": 0.1, "final_ratio": 0.5}}),
        steps_per_epoch=10,
    )
    assert pm == (0.1, 0.5, 700, 5000)
    pm = _patch_mask_schedule(
        cfg_of(training={"patch_mask": {
            "init_step": 100, "final_step": 1000,
            "init_ratio": 0.1, "final_ratio": 0.5,
        }}),
        steps_per_epoch=10,
    )
    assert pm == (0.1, 0.5, 100, 1000)

    # fractional epochs ceil like the reference conversion
    pm = _patch_mask_schedule(
        cfg_of(training={"patch_mask": {
            "init_epoch": 0.5, "final_epoch": 1.5,
            "init_ratio": 0.1, "final_ratio": 0.5,
        }}),
        steps_per_epoch=10,
    )
    assert pm == (0.1, 0.5, 5, 15)

    # final_ratio == 0 disables masking
    assert _patch_mask_schedule(
        cfg_of(training={"patch_mask": {"final_ratio": 0.0}}), 10
    ) is None
    # absent -> None
    assert _patch_mask_schedule(cfg_of(), 10) is None

    # legacy alias
    pm = _patch_mask_schedule(
        cfg_of(callbacks={"patch_masking": {
            "init_ratio": 0.1, "final_ratio": 0.5,
            "start_epoch": 0, "end_epoch": 1,
        }}),
        steps_per_epoch=10,
    )
    assert pm == (0.1, 0.5, 0, 10)


def test_anneal_weight():
    """Ramp 0 -> 1 by increase_factor after freeze_until_epoch
    (reference callbacks.py:59-76)."""
    kwargs = dict(init_val=0.0, increase_factor=0.01, final_val=1.0,
                  freeze_until_epoch=60)
    assert float(anneal_weight(0, **kwargs)) == 0.0
    assert float(anneal_weight(60, **kwargs)) == 0.0
    assert float(anneal_weight(61, **kwargs)) == pytest.approx(0.01)
    assert float(anneal_weight(100, **kwargs)) == pytest.approx(0.4)
    assert float(anneal_weight(1000, **kwargs)) == 1.0
