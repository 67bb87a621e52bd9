"""Tests for PredictionHandler (context shift fix, CSV assembly) —
mirroring reference tests/utils/test_predictions.py semantics."""

import numpy as np
import pytest

from lightning_pose_tpu.config import Config
from lightning_pose_tpu.utils.predictions import PredictionHandler


class _FakeSplit:
    def __init__(self, indices):
        self.indices = np.asarray(indices)


class _FakeDataset:
    def __init__(self, n):
        self.image_names = [f"img{i:02d}.png" for i in range(n)]
        self.do_context = False

    def __len__(self):
        return len(self.image_names)


class _FakeDataModule:
    def __init__(self, n):
        self.dataset = _FakeDataset(n)
        self.train_dataset = _FakeSplit(list(range(0, n - 4)))
        self.val_dataset = _FakeSplit([n - 4, n - 3])
        self.test_dataset = _FakeSplit([n - 2, n - 1])


def _cfg(model_type="heatmap", keypoints=("a", "b")):
    return Config(
        {
            "data": {"keypoint_names": list(keypoints)},
            "model": {"model_type": model_type},
        }
    )


def test_labeled_dataframe_assembly():
    n = 10
    handler = PredictionHandler(cfg=_cfg(), data_module=_FakeDataModule(n))
    preds = [
        (np.ones((5, 4)), np.full((5, 2), 0.5)),
        (np.ones((5, 4)) * 2, np.full((5, 2), 0.9)),
    ]
    df = handler(preds)
    assert df.shape == (10, 7)  # 2 kps x 3 + set column
    assert list(df.index) == handler.data_module.dataset.image_names
    assert df.iloc[0][("set", "", "")] == "train"
    assert df.iloc[-1][("set", "", "")] == "test"
    assert df.columns[0] == ("heatmap_tracker", "a", "x")
    assert df.iloc[7][("heatmap_tracker", "a", "likelihood")] == pytest.approx(0.9)


def test_video_trimming(tmp_path, toy_data_dir):
    """Extra FILL rows from the last batch are discarded
    (reference predictions.py:117-126)."""
    video = f"{toy_data_dir}/videos/test_vid.mp4"
    handler = PredictionHandler(cfg=_cfg(), video_file=video)
    n = handler.frame_count
    # two batches of 512 = 1024 rows > n frames
    preds = [
        (np.zeros((512, 4)), np.zeros((512, 2))),
        (np.zeros((512, 4)), np.zeros((512, 2))),
    ]
    df = handler(preds)
    assert df.shape[0] == n


def test_fix_context_preds_confs():
    """Context outputs shift by 2 with edge padding
    (reference predictions.py:144-175)."""

    class _H(PredictionHandler):
        def __init__(self, frame_count):
            self.cfg = _cfg("heatmap_mhcrnn")
            self.data_module = None
            self.video_file = "x"
            self._fc = frame_count

        @property
        def frame_count(self):
            return self._fc

    # case 1: shifted output already matches frame_count -> last two rows
    # take row -3's value (reference predictions.py:159-162)
    h = _H(frame_count=8)
    stacked = np.arange(8)[:, None].astype(float)
    fixed = h.fix_context_preds_confs(stacked)
    assert fixed.shape[0] == 8
    assert fixed[0, 0] == 0 and fixed[1, 0] == 0  # two copies of output 0
    assert fixed[2, 0] == 0  # frame 2 <- output 0
    assert fixed[3, 0] == 1
    assert fixed[-1, 0] == fixed[-3, 0]
    assert fixed[-2, 0] == fixed[-3, 0]

    # case 2: fewer outputs than frames -> pad with row 0
    # (reference predictions.py:163-168)
    stacked = np.arange(6)[:, None].astype(float)
    fixed = h.fix_context_preds_confs(stacked)
    assert fixed.shape[0] == 8
    assert fixed[-1, 0] == fixed[0, 0]

    conf_fixed = h.fix_context_preds_confs(
        np.arange(8)[:, None].astype(float), zero_pad_confidence=True
    )
    assert conf_fixed[0, 0] == 0.0 and conf_fixed[-1, 0] == 0.0


def test_make_pred_arr_undo_resize():
    kp = np.array([[1.0, 2.0, 3.0, 4.0]])
    conf = np.array([[0.5, 0.6]])
    arr = PredictionHandler.make_pred_arr_undo_resize(kp, conf)
    np.testing.assert_allclose(arr[0], [1.0, 2.0, 0.5, 3.0, 4.0, 0.6])
    with pytest.raises(AssertionError):
        PredictionHandler.make_pred_arr_undo_resize(kp, np.ones((2, 2)))
