"""Checkpoint backends: msgpack file vs async Orbax directory, one
naming/discovery contract (reference io.py:38-146, callbacks.py:675-689)."""

import os

import numpy as np
import pytest

from lightning_pose_tpu.train import checkpoints as ckpt_utils
from lightning_pose_tpu.utils.io import ckpt_path_from_base_path


def _payload():
    return (
        {"dense": {"kernel": np.arange(12, dtype=np.float32).reshape(3, 4)}},
        {"bn": {"mean": np.ones((4,), dtype=np.float32)}},
    )


@pytest.mark.parametrize("backend", ["msgpack", "orbax"])
def test_save_load_roundtrip(tmp_path, backend):
    params, batch_stats = _payload()
    path = str(tmp_path / "epoch=3-step=40-best.ckpt")
    ckpt_utils.save_checkpoint(
        path, params, batch_stats, step=40, epoch=3,
        extra={"note": "x"}, backend=backend,
    )
    ckpt_utils.wait_for_saves()
    if backend == "orbax":
        assert os.path.isdir(path)
    else:
        assert os.path.isfile(path)

    loaded = ckpt_utils.load_checkpoint(path)
    np.testing.assert_array_equal(
        loaded["params"]["dense"]["kernel"], params["dense"]["kernel"]
    )
    np.testing.assert_array_equal(
        loaded["batch_stats"]["bn"]["mean"], batch_stats["bn"]["mean"]
    )
    assert int(loaded["step"]) == 40
    assert int(loaded["epoch"]) == 3

    ckpt_utils.remove_checkpoint(path)
    assert not os.path.exists(path)


@pytest.mark.parametrize("backend", ["msgpack", "orbax"])
def test_discovery_contract(tmp_path, backend):
    """Both backends produce paths ckpt_path_from_base_path discovers."""
    params, batch_stats = _payload()
    version_dir = ckpt_utils.next_version_dir(str(tmp_path), "mymodel")
    ckpt_dir = ckpt_utils.checkpoint_dir(version_dir)
    path = os.path.join(ckpt_dir, "epoch=1-step=10-best.ckpt")
    ckpt_utils.save_checkpoint(
        path, params, batch_stats, step=10, epoch=1, backend=backend
    )
    ckpt_utils.wait_for_saves()
    found = ckpt_path_from_base_path(str(tmp_path), "mymodel")
    assert found == path


def test_best_overwrite_orbax(tmp_path):
    """The trainer's best-ckpt replace sequence (remove old, save new)
    works when the checkpoint is an Orbax directory."""
    params, batch_stats = _payload()
    p1 = str(tmp_path / "epoch=0-step=5-best.ckpt")
    ckpt_utils.save_checkpoint(p1, params, batch_stats, 5, 0, backend="orbax")
    ckpt_utils.remove_checkpoint(p1)
    p2 = str(tmp_path / "epoch=1-step=10-best.ckpt")
    ckpt_utils.save_checkpoint(p2, params, batch_stats, 10, 1, backend="orbax")
    ckpt_utils.wait_for_saves()
    assert not os.path.exists(p1)
    assert os.path.isdir(p2)
    assert int(ckpt_utils.load_checkpoint(p2)["step"]) == 10


def _model_payload(num_out=4):
    params = {
        "backbone": {"conv": {"kernel": np.full((3, 3), 2.0, np.float32)}},
        "head": {"dense": {"kernel": np.zeros((3, num_out), np.float32)}},
    }
    batch_stats = {"backbone": {"bn": {"mean": np.ones((3,), np.float32)}}}
    return params, batch_stats


def test_resolve_checkpoint_path_from_model_dir(tmp_path):
    """A model DIRECTORY resolves to the first *.ckpt found recursively
    (reference models/factory.py:213-215)."""
    params, batch_stats = _model_payload()
    ckpt = (
        tmp_path / "tb_logs" / "m" / "version_0" / "checkpoints"
        / "epoch=3-step=40-best.ckpt"
    )
    ckpt.parent.mkdir(parents=True)
    ckpt_utils.save_checkpoint(str(ckpt), params, batch_stats, step=40, epoch=3)
    ckpt_utils.wait_for_saves()
    assert ckpt_utils.resolve_checkpoint_path(str(tmp_path)) == str(ckpt)
    # a direct file path passes through untouched
    assert ckpt_utils.resolve_checkpoint_path(str(ckpt)) == str(ckpt)
    empty = tmp_path / "empty_model_dir"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        ckpt_utils.resolve_checkpoint_path(str(empty))


def test_warm_start_full_load(tmp_path):
    params, batch_stats = _model_payload()
    path = str(tmp_path / "w.ckpt")
    ckpt_utils.save_checkpoint(path, params, batch_stats, step=1, epoch=0)
    ckpt_utils.wait_for_saves()

    fresh, fresh_bs = _model_payload()
    fresh["backbone"]["conv"]["kernel"][:] = 0.0
    fresh["head"]["dense"]["kernel"][:] = 9.0
    out_p, out_bs, full = ckpt_utils.warm_start(fresh, fresh_bs, path)
    assert full
    np.testing.assert_array_equal(out_p["backbone"]["conv"]["kernel"], 2.0)
    np.testing.assert_array_equal(out_p["head"]["dense"]["kernel"], 0.0)
    np.testing.assert_array_equal(out_bs["backbone"]["bn"]["mean"], 1.0)


def test_warm_start_backbone_only_on_head_mismatch(tmp_path):
    """A checkpoint with a different head size loads backbone weights only
    (reference models/factory.py:224-229, test_factory.py:91)."""
    params, batch_stats = _model_payload(num_out=4)
    path = str(tmp_path / "w.ckpt")
    ckpt_utils.save_checkpoint(path, params, batch_stats, step=1, epoch=0)
    ckpt_utils.wait_for_saves()

    fresh, fresh_bs = _model_payload(num_out=6)  # different num_keypoints
    fresh["backbone"]["conv"]["kernel"][:] = 0.0
    fresh["head"]["dense"]["kernel"][:] = 9.0
    out_p, out_bs, full = ckpt_utils.warm_start(fresh, fresh_bs, path)
    assert not full
    np.testing.assert_array_equal(out_p["backbone"]["conv"]["kernel"], 2.0)
    # head untouched
    np.testing.assert_array_equal(out_p["head"]["dense"]["kernel"], 9.0)
    np.testing.assert_array_equal(out_bs["backbone"]["bn"]["mean"], 1.0)
