"""Tests for datasets + data modules (splits, subsampling, batching) —
mirroring reference tests/data/test_datasets.py / test_datamodules.py."""

import numpy as np
import pytest

from lightning_pose_tpu.data.datamodules import BaseDataModule
from lightning_pose_tpu.data.datasets import HeatmapDataset, build_hflip_swap_indices
from lightning_pose_tpu.data.factory import get_data_module, get_dataset


@pytest.fixture(scope="module")
def dataset(toy_data_dir_module):
    return HeatmapDataset(
        root_directory=toy_data_dir_module,
        csv_path="CollectedData.csv",
        image_resize_height=128,
        image_resize_width=128,
    )


@pytest.fixture(scope="module")
def toy_data_dir_module():
    import os

    path = "/root/reference/data/mirror-mouse-example"
    if not os.path.isdir(path):
        pytest.skip("toy data unavailable")
    return path


def test_dataset_basic(dataset):
    assert len(dataset) == 90
    assert dataset.num_keypoints == 17
    assert dataset.num_targets == 34
    s = dataset[0]
    assert s["images"].shape == (128, 128, 3)
    assert s["images"].dtype == np.uint8
    assert s["keypoints"].shape == (17, 2)
    assert s["visibility"].shape == (17,)
    # bbox is the original frame (x, y, h, w)
    np.testing.assert_allclose(s["bbox"], [0, 0, 406, 396])


def test_keypoints_scaled_to_resize(dataset):
    kp = dataset.keypoints_resized(0)
    raw = dataset.raw_keypoints[0]
    np.testing.assert_allclose(kp[:, 0], raw[:, 0] * 128 / 396, rtol=1e-5)
    np.testing.assert_allclose(kp[:, 1], raw[:, 1] * 128 / 406, rtol=1e-5)


def test_nan_visibility_semantics(toy_data_dir_module):
    ds_drop = HeatmapDataset(
        root_directory=toy_data_dir_module, csv_path="CollectedData.csv",
        image_resize_height=128, image_resize_width=128,
        uniform_heatmaps_for_nan_keypoints=False,
    )
    ds_uniform = HeatmapDataset(
        root_directory=toy_data_dir_module, csv_path="CollectedData.csv",
        image_resize_height=128, image_resize_width=128,
        uniform_heatmaps_for_nan_keypoints=True,
    )
    # frame 0 has NaN keypoints (tailBase/tailMid rows in the csv)
    nan_mask = np.isnan(ds_drop.raw_keypoints[0, :, 0])
    assert nan_mask.any()
    assert (ds_drop[0]["visibility"][nan_mask] == 0).all()
    assert (ds_uniform[0]["visibility"][nan_mask] == 1).all()
    assert (ds_uniform[0]["visibility"][~nan_mask] == 2).all()


def test_split_sizes_and_determinism(dataset):
    dm1 = BaseDataModule(dataset, train_probability=0.8, val_probability=0.1,
                         torch_seed=42)
    dm2 = BaseDataModule(dataset, train_probability=0.8, val_probability=0.1,
                         torch_seed=42)
    assert len(dm1.train_dataset) == 72
    assert len(dm1.val_dataset) == 9
    assert len(dm1.test_dataset) == 9
    np.testing.assert_array_equal(dm1.train_dataset.indices, dm2.train_dataset.indices)
    # no index overlap
    all_idx = np.concatenate(
        [dm1.train_dataset.indices, dm1.val_dataset.indices, dm1.test_dataset.indices]
    )
    assert len(np.unique(all_idx)) == 90


def test_train_frames_subsampling(dataset):
    dm = BaseDataModule(dataset, train_probability=0.8, val_probability=0.1,
                        train_frames=10, torch_seed=0)
    assert len(dm.train_dataset) == 10
    dm = BaseDataModule(dataset, train_probability=0.8, val_probability=0.1,
                        train_frames=0.5, torch_seed=0)
    assert len(dm.train_dataset) == 36
    dm = BaseDataModule(dataset, train_probability=0.8, val_probability=0.1,
                        train_frames=1, torch_seed=0)
    assert len(dm.train_dataset) == 72


def test_batches_are_padded_and_masked(dataset):
    dm = BaseDataModule(dataset, train_batch_size=32, train_probability=0.8,
                        val_probability=0.1, torch_seed=0)
    batches = list(dm.train_batches(epoch=0))
    assert len(batches) == 3  # ceil(72/32)
    last = batches[-1]
    assert last["images"].shape[0] == 32  # static shape
    assert last["valid"].sum() == 72 - 64
    # padded rows have visibility zeroed
    assert (last["visibility"][~last["valid"]] == 0).all()


def test_index_batches_match_batches(dataset):
    dm = BaseDataModule(dataset, train_batch_size=16, train_probability=0.8,
                        val_probability=0.1, torch_seed=3)
    idx_batches = list(dm.train_index_batches(epoch=2))
    batches = list(dm.train_batches(epoch=2))
    assert len(idx_batches) == len(batches)
    for (idxs, valid), batch in zip(idx_batches, batches):
        np.testing.assert_array_equal(valid, batch["valid"])
        np.testing.assert_array_equal(
            idxs[valid], batch["idxs"][batch["valid"]]
        )


def test_steps_cycling(dataset):
    """Semi-supervised min-10-steps floor rewraps the loader."""
    dm = BaseDataModule(dataset, train_batch_size=32, train_probability=0.8,
                        val_probability=0.1, torch_seed=0)
    batches = list(dm.train_batches(epoch=0, steps=10))
    assert len(batches) == 10


def test_hflip_swap_indices():
    idx = build_hflip_swap_indices(["nose", "paw_left", "paw_right", "tail"])
    np.testing.assert_array_equal(idx, [0, 2, 1, 3])
    with pytest.raises(ValueError):
        build_hflip_swap_indices(["paw_left", "nose"])


def test_extractor(dataset):
    from lightning_pose_tpu.data.extractor import DataExtractor

    dm = BaseDataModule(dataset, train_probability=0.8, val_probability=0.1,
                        torch_seed=0)
    kps, images = DataExtractor(dm, cond="train")()
    assert kps.shape == (72, 34)
    assert images is None
    with pytest.raises(ValueError):
        DataExtractor(dm, cond="bogus")


def test_unlabeled_data_module_pairs_batches(cfg, toy_data_dir_module):
    """Each training batch carries an 'unlabeled' frames dict — the
    max_size_cycle pairing of labeled + video batches (reference
    datamodules.py:240-341)."""
    from lightning_pose_tpu.data.factory import get_data_module, get_dataset
    from lightning_pose_tpu.data.unlabeled import UnlabeledDataModule

    c = cfg.copy()
    c.model.losses_to_use = ["temporal"]
    c.dali.base.train.sequence_length = 4
    ds = get_dataset(c, toy_data_dir_module, imgaug_pipeline="default")
    dm = get_data_module(c, ds, video_dir=c.data.video_dir)
    assert isinstance(dm, UnlabeledDataModule)
    try:
        n = 0
        for batch in dm.train_batches(epoch=0, steps=3):
            assert "unlabeled" in batch
            frames = batch["unlabeled"]["frames"]
            assert frames.shape == (4, 128, 128, 3)
            assert frames.dtype.name == "uint8"
            assert batch["images"].shape[0] == c.training.train_batch_size
            n += 1
        assert n == 3
    finally:
        dm.close()


def test_split_sizes_edge_cases():
    """Extra floored samples go to test when >=5; one labeled frame raises
    (reference tests/data/test_utils.py:7-57)."""
    from lightning_pose_tpu.data.datamodules import split_sizes_from_probabilities

    assert split_sizes_from_probabilities(101, 0.7) == (70, 15, 16)
    assert split_sizes_from_probabilities(100, 0.7) == (70, 15, 15)
    with pytest.raises(ValueError):
        split_sizes_from_probabilities(1, 0.95)


def test_train_frames_semantics(dataset):
    """train_frames: None/1/too-large -> all; int -> count; fraction ->
    floor(frac*n); <=0 raises (reference tests/data/test_utils.py:85-119
    compute_num_train_frames)."""
    from lightning_pose_tpu.data.datamodules import BaseDataModule

    full = BaseDataModule(dataset=dataset, train_probability=0.8, torch_seed=0)
    n_train = len(full.train_dataset.indices)

    for tf, expect in [
        (None, n_train),
        (1, n_train),
        (n_train + 10, n_train),
        (5, 5),
        (0.5, n_train // 2),
        (0.2, max(1, int(np.floor(0.2 * n_train)))),
    ]:
        dm = BaseDataModule(
            dataset=dataset, train_probability=0.8, torch_seed=0, train_frames=tf
        )
        assert len(dm.train_dataset.indices) == expect, tf
        # val/test splits unaffected by subsampling
        np.testing.assert_array_equal(
            dm.val_dataset.indices, full.val_dataset.indices
        )

    with pytest.raises(ValueError):
        BaseDataModule(
            dataset=dataset, train_probability=0.8, torch_seed=0, train_frames=-1
        )
