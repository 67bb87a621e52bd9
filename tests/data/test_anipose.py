"""Anipose calibration format: TOML parsing, frame-map CSV, discovery,
and the 3D-loss e2e path (reference datasets.py:582-760)."""

import os

import numpy as np
import pandas as pd
import pytest

_TOML_TEMPLATE = """
[cam_0]
name = "top"
size = [ 396, 168,]
matrix = [ [ 400.0, 0.0, 198.0,], [ 0.0, 400.0, 84.0,], [ 0.0, 0.0, 1.0,],]
distortions = [ -0.05, 0.01, 0.0, 0.0, 0.0,]
rotation = [ 0.01, -0.02, 0.005,]
translation = [ 0.5, -0.2, 10.0,]

[cam_1]
name = "bot"
size = [ 396, 238,]
matrix = [ [ 410.0, 0.0, 198.0,], [ 0.0, 410.0, 119.0,], [ 0.0, 0.0, 1.0,],]
distortions = [ -0.04,]
rotation = [ 1.2, 0.1, -0.3,]
translation = [ -0.4, 0.3, 9.5,]

[metadata]
adjusted = true
error = 0.31
"""


def _write_toml(path):
    with open(path, "w") as f:
        f.write(_TOML_TEMPLATE)


def test_rodrigues_matches_cv2(rng):
    import cv2

    from lightning_pose_tpu.data.anipose import rodrigues

    for _ in range(5):
        rvec = rng.normal(size=3)
        ref, _ = cv2.Rodrigues(rvec)
        np.testing.assert_allclose(rodrigues(rvec), ref, atol=1e-10)
    np.testing.assert_allclose(rodrigues(np.zeros(3)), np.eye(3), atol=0)


def test_load_anipose_toml(tmp_path):
    from lightning_pose_tpu.data.anipose import load_anipose_toml, rodrigues

    path = tmp_path / "calibration.toml"
    _write_toml(path)
    calib = load_anipose_toml(str(path))
    assert calib["names"] == ["top", "bot"]
    assert calib["intrinsics"].shape == (2, 3, 3)
    assert calib["extrinsics"].shape == (2, 3, 4)
    assert calib["distortions"].shape == (2, 5)
    np.testing.assert_allclose(calib["intrinsics"][0][0, 0], 400.0)
    # short distortion lists are zero-padded to 5
    np.testing.assert_allclose(calib["distortions"][1], [-0.04, 0, 0, 0, 0])
    # extrinsics = [R | t] with R from the Rodrigues vector
    np.testing.assert_allclose(
        calib["extrinsics"][1][:, :3], rodrigues([1.2, 0.1, -0.3]), atol=1e-6
    )
    np.testing.assert_allclose(calib["extrinsics"][0][:, 3], [0.5, -0.2, 10.0])


def _mv_cfg(cfg, mv_data_dir):
    c = cfg.copy()
    c.data.data_dir = str(mv_data_dir)
    c.data.video_dir = f"{mv_data_dir}/videos"
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.view_names = ["top", "bot"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = None
    c.data.mirrored_column_matches = [0, 1, 2, 3, 4, 5, 6]
    c.data.columns_for_singleview_pca = None
    c.model.model_type = "heatmap_multiview"
    c.model.backbone = "vits_dino"
    return c


def test_frame_map_csv_loads_per_frame_camgroups(cfg, mv_data_dir, tmp_path):
    """The reference's native format: CSV mapping each frame to an anipose
    TOML (reference datasets.py:674-697)."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    _write_toml(os.path.join(mv_data_dir, "session0.toml"))
    c = _mv_cfg(cfg, mv_data_dir)
    ds_plain = MultiviewHeatmapDataset(c, str(mv_data_dir))
    frame_map = pd.DataFrame(
        {"file": ["session0.toml"] * len(ds_plain.image_names)},
        index=ds_plain.image_names,
    )
    cam_csv = tmp_path / "cams.csv"
    frame_map.to_csv(cam_csv)
    c.data.camera_params_file = str(cam_csv)

    ds = MultiviewHeatmapDataset(c, str(mv_data_dir))
    assert ds.is_calibrated
    sample = ds[0]
    assert sample["intrinsic_matrix"].shape == (2, 3, 3)
    assert sample["extrinsic_matrix"].shape == (2, 3, 4)
    assert sample["distortions"].shape == (2, 5)

    # wrong view order in the TOML raises (reference datasets.py:665-670)
    c_bad = _mv_cfg(cfg, mv_data_dir)
    c_bad.data.view_names = ["bot", "top"]
    c_bad.data.csv_file = ["bot.csv", "top.csv"]
    c_bad.data.camera_params_file = str(cam_csv)
    with pytest.raises(ValueError, match="same camera order"):
        MultiviewHeatmapDataset(c_bad, str(mv_data_dir))


def test_single_toml_camera_params_file(cfg, mv_data_dir):
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    toml_path = os.path.join(mv_data_dir, "calib_single.toml")
    _write_toml(toml_path)
    c = _mv_cfg(cfg, mv_data_dir)
    c.data.camera_params_file = toml_path
    ds = MultiviewHeatmapDataset(c, str(mv_data_dir))
    assert ds.is_calibrated
    assert ds[3]["intrinsic_matrix"].shape == (2, 3, 3)


def test_discovery_from_image_paths(cfg, mv_data_dir, tmp_path):
    """Path-based discovery: labeled-data/<session>_<view> ->
    calibrations/<session>.toml (reference datasets.py:698-760). Uses a
    symlinked copy so the shared fixture stays calibration-free."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    d = tmp_path / "data"
    d.mkdir()
    os.symlink(os.path.join(mv_data_dir, "labeled-data"), d / "labeled-data")
    os.symlink(os.path.join(mv_data_dir, "videos"), d / "videos")
    for csv in ("top.csv", "bot.csv"):
        os.symlink(os.path.join(mv_data_dir, csv), d / csv)
    (d / "calibrations").mkdir()
    _write_toml(d / "calibrations" / "example.toml")

    c = _mv_cfg(cfg, d)
    ds = MultiviewHeatmapDataset(c, str(d))
    assert ds.is_calibrated
    assert ds[0]["intrinsic_matrix"].shape == (2, 3, 3)

    # without any toml: not calibrated, samples carry no camera keys
    ds_plain = MultiviewHeatmapDataset(_mv_cfg(cfg, mv_data_dir), str(mv_data_dir))
    assert not ds_plain.is_calibrated
    assert "intrinsic_matrix" not in ds_plain[0]


def _bare_mv_dataset(root, image_names, do_context=False):
    """Minimal MultiviewHeatmapDataset shell for unit-testing the pure
    discovery logic (the reference tests DALI post-processing the same
    way, reference data/dali.py:215-224 object.__new__ pattern)."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    ds = object.__new__(MultiviewHeatmapDataset)
    ds.root_directory = str(root)
    ds.image_names = list(image_names)
    ds.view_names = ["top", "bot"]
    ds.do_context = do_context
    ds.camera_params = None
    ds._calib_by_file = {}
    ds._calib_file_per_frame = None
    return ds


def test_discovery_malformed_path_raises(tmp_path):
    """Paths not under labeled-data/<session>_<view>/ are an error, not
    silently treated as "no calibration" (reference datasets.py:716-730)."""
    ds = _bare_mv_dataset(tmp_path, ["imgs/img000.png"])
    with pytest.raises(ValueError, match="labeled-data"):
        ds._discover_cam_params_from_image_paths()

    ds = _bare_mv_dataset(tmp_path, ["labeled-data/noview/img000.png"])
    with pytest.raises(ValueError, match="<session>_<view>"):
        ds._discover_cam_params_from_image_paths()


def test_discovery_partial_calibration_disables_3d(tmp_path, caplog):
    """Some sessions calibrated, some not: warn and disable 3D for the
    whole dataset instead of failing (reference datasets.py:740-760)."""
    import logging

    (tmp_path / "calibrations").mkdir()
    _write_toml(tmp_path / "calibrations" / "sessA.toml")
    names = [
        "labeled-data/sessA_top/img000.png",
        "labeled-data/sessB_top/img000.png",  # no sessB.toml, no fallback
    ]
    ds = _bare_mv_dataset(tmp_path, names)
    with caplog.at_level(logging.WARNING):
        ds._discover_cam_params_from_image_paths()
    assert not ds.is_calibrated
    assert any("disabling 3D" in r.message for r in caplog.records)

    # with the root-level fallback present, every frame resolves
    _write_toml(tmp_path / "calibration.toml")
    ds2 = _bare_mv_dataset(tmp_path, names)
    ds2._discover_cam_params_from_image_paths()
    assert ds2.is_calibrated
    assert ds2._calib_file_per_frame == [
        os.path.join("calibrations", "sessA.toml"),
        "calibration.toml",
    ]


@pytest.mark.slow
def test_train_multiview_3d_losses_from_anipose_calibration(
    cfg, mv_data_dir, tmp_path
):
    """Anipose frame-map calibration drives the 3D augmentation and the
    supervised pairwise-projections loss through train()."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset
    from lightning_pose_tpu.train import train

    _write_toml(os.path.join(mv_data_dir, "session0.toml"))
    c = _mv_cfg(cfg, mv_data_dir)
    ds_plain = MultiviewHeatmapDataset(c, str(mv_data_dir))
    frame_map = pd.DataFrame(
        {"file": ["session0.toml"] * len(ds_plain.image_names)},
        index=ds_plain.image_names,
    )
    cam_csv = tmp_path / "cams.csv"
    frame_map.to_csv(cam_csv)

    c.data.camera_params_file = str(cam_csv)
    c.losses.supervised_pairwise_projections = {"log_weight": 0.0}
    c.training.imgaug = "dlc-mv"
    c.training.train_batch_size = 2
    c.training.val_batch_size = 2
    c.training.test_batch_size = 2
    c.training.train_frames = 4
    c.training.max_epochs = 1
    c.training.min_epochs = 1
    c.training.check_val_every_n_epoch = 1
    c.training.unfreezing_epoch = 0
    c.model.model_name = "mv-3d-anipose"
    c.eval.predict_vids_after_training = False
    model_dir = tmp_path / "model"
    train(c, model_dir=model_dir, skip_evaluation=True)
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    assert ckpt_path_from_base_path(str(model_dir), "mv-3d-anipose") is not None
