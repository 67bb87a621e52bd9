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
