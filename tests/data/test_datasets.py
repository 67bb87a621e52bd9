"""Dataset-level tests mirroring the reference's test intents
(reference tests/data/test_datasets.py): visibility-column parsing,
context-frame stacks with edge handling, multiview batch contracts.

Reference-case mapping (reference tests/data/test_datasets.py):
  :27,1363   base/heatmap dataset basics + equal return sizes  -> here
             (test_base_and_heatmap_equal_sizes, resize-dims sweep) and
             tests/data/test_datamodules.py (test_dataset_basic)
  :45-82     heatmap dataset + context shapes                  -> here
  :83-527    multiview batch/context/resize contracts          -> here
             (fusion ordering, context stacks, resize sweep)
  :390       (64,64)/(128,256)/(480,640) resize parametrize    -> here
             (test_resize_dims_sweep)
  :529-924   Apply3DTransforms incl. cv2 goldens, scaling/
             translation monotonicity, NaN/insufficient-kp     -> tests/data/test_cameras.py
  :925-1016  camgroup + frame-map CSV loading                  -> tests/data/test_anipose.py
  :1017-1160 path-based TOML discovery                         -> here
             (test_discovery_*; partial-calibration case in
             tests/data/test_anipose.py)
  :1162-1361 visibility parsing                                -> here
  :1368-1405 hflip swap indices                                -> here
  :1407-1611 hflip behavior (mirror/swap/context/val-gating)   -> tests/ops/test_augment.py
             (keypoint+visibility swap) and tests/test_train.py
             (test_train_hflip_left_right_pairs e2e; val/test
             loaders never enter the train-only aug engine)
"""

import os

import numpy as np
import pytest

from lightning_pose_tpu.data.datasets import HeatmapDataset

TOY = "/root/reference/data/mirror-mouse-example"


@pytest.fixture(scope="module")
def toy():
    if not os.path.isdir(TOY):
        pytest.skip("mirror-mouse example data not available")
    return TOY


# -- visibility-column parsing (reference test_datasets.py:1162-1260) ---------


def _write_img(path, h=40, w=30):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, np.random.randint(0, 255, (h, w, 3), dtype=np.uint8))


@pytest.fixture()
def visibility_data_dir(tmp_path):
    """DLC CSV with a `visible` column; two keypoints, two frames."""
    (tmp_path / "labels.csv").write_text(
        "scorer,s,s,s,s,s,s\n"
        "bodyparts,kp1,kp1,kp1,kp2,kp2,kp2\n"
        "coords,x,y,visible,x,y,visible\n"
        "img01.png,24.0,24.0,2,,,1\n"
        "img02.png,12.0,30.0,2,,,0\n"
    )
    _write_img(str(tmp_path / "img01.png"))
    _write_img(str(tmp_path / "img02.png"))
    return tmp_path


def test_visibility_column_parsed(visibility_data_dir):
    ds = HeatmapDataset(
        root_directory=str(visibility_data_dir), csv_path="labels.csv",
        image_resize_height=128, image_resize_width=128,
    )
    assert ds.visibility is not None
    assert ds.visibility.shape == (2, 2)
    assert ds.visibility.dtype == np.int64
    # frame 0: kp1 visible(2), kp2 occluded(1); frame 1: kp2 unlabeled(0)
    assert ds.visibility[0, 0] == 2 and ds.visibility[0, 1] == 1
    assert ds.visibility[1, 0] == 2 and ds.visibility[1, 1] == 0
    # the sample carries the parsed flags verbatim
    assert list(ds[0]["visibility"]) == [2, 1]
    assert list(ds[1]["visibility"]) == [2, 0]


def test_no_visibility_column(visibility_data_dir):
    (visibility_data_dir / "plain.csv").write_text(
        "scorer,s,s,s,s\n"
        "bodyparts,kp1,kp1,kp2,kp2\n"
        "coords,x,y,x,y\n"
        "img01.png,24.0,24.0,12.0,30.0\n"
        "img02.png,5.0,10.0,15.0,20.0\n"
    )
    ds = HeatmapDataset(
        root_directory=str(visibility_data_dir), csv_path="plain.csv",
        image_resize_height=128, image_resize_width=128,
    )
    assert ds.visibility is None
    # without a visible column: labeled -> 2, NaN -> 0 (default semantics)
    assert (ds[0]["visibility"] == 2).all()


def test_occluded_with_coords_warns(visibility_data_dir, caplog):
    """visible=1 keypoints carrying non-NaN coordinates log a warning; the
    flag wins and a uniform heatmap is generated (reference
    test_datasets.py:1255-1276)."""
    import logging

    (visibility_data_dir / "occ.csv").write_text(
        "scorer,s,s,s\n"
        "bodyparts,kp1,kp1,kp1\n"
        "coords,x,y,visible\n"
        "img01.png,24.0,24.0,1\n"
    )
    with caplog.at_level(
        logging.WARNING, logger="lightning_pose_tpu.data.datasets"
    ):
        HeatmapDataset(
            root_directory=str(visibility_data_dir), csv_path="occ.csv",
            image_resize_height=128, image_resize_width=128,
        )
    assert any("visible=1" in r.message for r in caplog.records)


def test_invalid_visibility_value_raises(visibility_data_dir):
    (visibility_data_dir / "bad.csv").write_text(
        "scorer,s,s,s\n"
        "bodyparts,kp1,kp1,kp1\n"
        "coords,x,y,visible\n"
        "img01.png,24.0,24.0,9\n"
    )
    with pytest.raises(ValueError, match="visibility column contains invalid"):
        HeatmapDataset(
            root_directory=str(visibility_data_dir), csv_path="bad.csv",
            image_resize_height=128, image_resize_width=128,
        )


# -- context stacks (reference base.py:151-188 sliding-window semantics) ------


def test_context_sample_shapes(toy):
    ds = HeatmapDataset(
        root_directory=toy, csv_path="CollectedData.csv",
        image_resize_height=128, image_resize_width=128, do_context=True,
    )
    s = ds[10]
    assert s["images"].shape == (5, 128, 128, 3)
    assert s["images"].dtype == np.uint8
    assert s["keypoints"].shape == (17, 2)


def test_context_edge_frames_repeat(tmp_path):
    """Frames whose +-2 context images do not exist on disk repeat the
    center frame (reference get_context_img_paths + edge handling)."""
    # one labeled frame with only its +1 neighbor on disk: -2/-1/+2 missing
    (tmp_path / "labels.csv").write_text(
        "scorer,s,s\n"
        "bodyparts,kp1,kp1\n"
        "coords,x,y\n"
        "vid/img000010.png,24.0,24.0\n"
    )
    _write_img(str(tmp_path / "vid" / "img000010.png"))
    _write_img(str(tmp_path / "vid" / "img000011.png"))
    ds = HeatmapDataset(
        root_directory=str(tmp_path), csv_path="labels.csv",
        image_resize_height=128, image_resize_width=128, do_context=True,
    )
    stack = ds[0]["images"]
    assert stack.shape == (5, 128, 128, 3)
    center = stack[2]
    # missing -2/-1/+2 neighbors are replaced by the center frame
    np.testing.assert_array_equal(stack[0], center)
    np.testing.assert_array_equal(stack[1], center)
    np.testing.assert_array_equal(stack[4], center)
    # the existing +1 neighbor is genuinely different
    assert not np.array_equal(stack[3], center)


def test_context_mode_repeat_center(toy):
    """`context_mode="repeat_center"` stacks 5 copies of the center frame
    regardless of which neighbor files exist (the product knob for
    datasets whose labeled frames are sparse video samples; motivated by
    scripts/mhcrnn_controlled.py — see docs/architecture.md)."""
    ds = HeatmapDataset(
        root_directory=toy, csv_path="CollectedData.csv",
        image_resize_height=128, image_resize_width=128, do_context=True,
        context_mode="repeat_center",
    )
    stack = ds[10]["images"]
    assert stack.shape == (5, 128, 128, 3)
    for t in range(5):
        np.testing.assert_array_equal(stack[t], stack[2])
    # the stock mode loads genuinely different neighbors for this frame
    adj = HeatmapDataset(
        root_directory=toy, csv_path="CollectedData.csv",
        image_resize_height=128, image_resize_width=128, do_context=True,
    )
    assert not np.array_equal(adj[10]["images"][0], adj[10]["images"][2])


def test_context_mode_invalid_raises(toy):
    with pytest.raises(ValueError, match="context_mode"):
        HeatmapDataset(
            root_directory=toy, csv_path="CollectedData.csv",
            image_resize_height=128, image_resize_width=128, do_context=True,
            context_mode="nearest",
        )


# -- multiview dataset contracts ----------------------------------------------


def test_multiview_batch_properties(cfg, mv_data_dir):
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    c = cfg.copy()
    c.data.data_dir = mv_data_dir
    c.data.view_names = ["top", "bot"]
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = None
    c.data.mirrored_column_matches = None
    c.data.columns_for_singleview_pca = None
    ds = MultiviewHeatmapDataset(cfg=c, data_dir=mv_data_dir)
    assert len(ds.view_names) == 2
    s = ds[0]
    assert s["num_views"] == 2
    assert s["images"].shape == (2, 128, 128, 3)  # (V, H, W, 3)
    assert s["keypoints"].shape == (14, 2)  # view-major V*K
    assert s["bbox"].shape == (8,)  # V * [x, y, h, w]
    assert len(ds) == 90


def test_multiview_mismatched_frames_raises(cfg, mv_data_dir, tmp_path):
    """Views whose label CSVs index different frames are rejected
    (the reference's cross-view consistency checks)."""
    import pandas as pd

    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    top = pd.read_csv(
        os.path.join(mv_data_dir, "top.csv"), header=[0, 1, 2], index_col=0
    )
    top_short = top.iloc[:-5]
    short_dir = tmp_path / "mv"
    short_dir.mkdir()
    top_short.to_csv(short_dir / "top.csv")
    import shutil

    shutil.copy(os.path.join(mv_data_dir, "bot.csv"), short_dir / "bot.csv")
    os.symlink(
        os.path.join(mv_data_dir, "labeled-data"), short_dir / "labeled-data"
    )

    c = cfg.copy()
    c.data.data_dir = str(short_dir)
    c.data.view_names = ["top", "bot"]
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = None
    c.data.mirrored_column_matches = None
    c.data.columns_for_singleview_pca = None
    with pytest.raises((ValueError, RuntimeError, AssertionError)):
        MultiviewHeatmapDataset(cfg=c, data_dir=str(short_dir))


def test_multiview_fusion_ordering(cfg, mv_data_dir):
    """Fused multiview samples keep view-major ordering consistent with the
    per-view child datasets: images stack in cfg view order, keypoints and
    bboxes concatenate per view (the reference's batch-properties and
    ordering invariants, reference test_datasets.py:161-215)."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    c = cfg.copy()
    c.data.data_dir = mv_data_dir
    c.data.view_names = ["top", "bot"]
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = None
    c.data.mirrored_column_matches = None
    c.data.columns_for_singleview_pca = None
    ds = MultiviewHeatmapDataset(cfg=c, data_dir=mv_data_dir)
    for idx in (0, 7):
        fused = ds[idx]
        for v, view in enumerate(["top", "bot"]):
            single = ds.view_datasets[view][idx]
            np.testing.assert_array_equal(fused["images"][v], single["images"])
            np.testing.assert_allclose(
                fused["keypoints"][v * 7:(v + 1) * 7], single["keypoints"],
            )
            np.testing.assert_allclose(
                fused["bbox"][v * 4:(v + 1) * 4], single["bbox"]
            )
            np.testing.assert_array_equal(
                fused["visibility"][v * 7:(v + 1) * 7], single["visibility"]
            )
    # PCA extraction path fuses the same way
    np.testing.assert_allclose(
        ds.keypoints_resized(0),
        np.concatenate(
            [ds.view_datasets[v].keypoints_resized(0) for v in ["top", "bot"]]
        ),
    )


def test_multiview_context_sample_shapes(cfg, mv_data_dir):
    """do_context multiview samples carry (V, 5, H, W, 3) stacks with the
    center frame equal to the non-context sample (reference
    test_datasets.py:184-215 context batch properties)."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    c = cfg.copy()
    c.data.data_dir = mv_data_dir
    c.data.view_names = ["top", "bot"]
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = None
    c.data.mirrored_column_matches = None
    c.data.columns_for_singleview_pca = None
    ds_ctx = MultiviewHeatmapDataset(cfg=c, data_dir=mv_data_dir, do_context=True)
    ds_plain = MultiviewHeatmapDataset(cfg=c, data_dir=mv_data_dir)
    assert ds_ctx.do_context
    s = ds_ctx[10]
    assert s["images"].shape[:2] == (2, 5)
    assert s["keypoints"].shape == (14, 2)
    np.testing.assert_array_equal(
        s["images"][:, 2], ds_plain[10]["images"]
    )
    np.testing.assert_allclose(s["keypoints"], ds_plain[10]["keypoints"])


def test_multiview_context_rejects_calibration(cfg, mv_data_dir, tmp_path):
    """Calibration + context is rejected (3D aug unsupported for context
    models — reference datasets.py:686,748 and the discovery/do_context
    raise tests)."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    c = cfg.copy()
    c.data.data_dir = mv_data_dir
    c.data.view_names = ["top", "bot"]
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = None
    c.data.mirrored_column_matches = None
    c.data.columns_for_singleview_pca = None
    c.data.camera_params_file = str(tmp_path / "anything.toml")
    with pytest.raises(ValueError, match="not supported"):
        MultiviewHeatmapDataset(
            cfg=c, data_dir=mv_data_dir, do_context=True
        )


def test_context_bbox_interaction(tmp_path):
    """bbox_file + do_context: every context frame is cropped through the
    SAME per-frame bbox, so the stacked images all reflect the crop and the
    sample bbox matches the file row (reference bbox+context handling)."""
    import pandas as pd

    (tmp_path / "labels.csv").write_text(
        "scorer,s,s\n"
        "bodyparts,kp1,kp1\n"
        "coords,x,y\n"
        "vid/img000010.png,24.0,24.0\n"
    )
    for i in range(8, 14):
        _write_img(str(tmp_path / "vid" / f"img{i:06d}.png"), h=64, w=48)
    bbox_df = pd.DataFrame(
        {"x": [10], "y": [5], "h": [32], "w": [24]},
        index=["vid/img000010.png"],
    )
    bbox_df.to_csv(tmp_path / "bboxes.csv")

    ds = HeatmapDataset(
        root_directory=str(tmp_path), csv_path="labels.csv",
        image_resize_height=128, image_resize_width=128, do_context=True,
        bbox_path=str(tmp_path / "bboxes.csv"),
    )
    s = ds[0]
    assert s["images"].shape == (5, 128, 128, 3)
    np.testing.assert_allclose(s["bbox"], [10, 5, 32, 24])
    # keypoints are expressed in the cropped/resized model space:
    # x: (24-10)/24*128, y: (24-5)/32*128
    np.testing.assert_allclose(
        s["keypoints"][0], [(24 - 10) / 24 * 128, (24 - 5) / 32 * 128], atol=1e-3
    )

    # without the bbox file the same frame resizes the full image
    ds_full = HeatmapDataset(
        root_directory=str(tmp_path), csv_path="labels.csv",
        image_resize_height=128, image_resize_width=128, do_context=True,
    )
    assert not np.array_equal(ds_full[0]["images"], s["images"])


# -- hflip swap indices (reference datasets.py:175-232) ------------------------


def test_hflip_swap_indices_pairs():
    from lightning_pose_tpu.data.datasets import build_hflip_swap_indices

    names = ["nose", "ear_left", "ear_right", "tail", "paw_left", "paw_right"]
    idx = build_hflip_swap_indices(names)
    assert idx.tolist() == [0, 2, 1, 3, 5, 4]


def test_hflip_swap_indices_no_pairs_is_identity():
    from lightning_pose_tpu.data.datasets import build_hflip_swap_indices

    idx = build_hflip_swap_indices(["nose", "tail", "spine"])
    assert idx.tolist() == [0, 1, 2]


def test_hflip_swap_indices_unmatched_raises():
    from lightning_pose_tpu.data.datasets import build_hflip_swap_indices

    with pytest.raises(ValueError, match="no _right partner"):
        build_hflip_swap_indices(["ear_left", "nose"])
    with pytest.raises(ValueError, match="no _left partner"):
        build_hflip_swap_indices(["ear_right", "nose"])


# -- keypoint resize / bbox semantics -----------------------------------------


def test_keypoints_resized_scaling(visibility_data_dir):
    """Keypoints scale by (resize / original) per axis; original images here
    are 40x30 (h x w)."""
    ds = HeatmapDataset(
        root_directory=str(visibility_data_dir), csv_path="labels.csv",
        image_resize_height=256, image_resize_width=128,
    )
    kp = ds.keypoints_resized(0)
    # CSV kp1 = (24, 24) in a 30-wide, 40-tall image
    np.testing.assert_allclose(kp[0, 0], 24.0 * 128 / 30, rtol=1e-6)
    np.testing.assert_allclose(kp[0, 1], 24.0 * 256 / 40, rtol=1e-6)


def test_uniform_heatmaps_for_nan_flag(visibility_data_dir):
    """Without a visible column: NaN labels -> vis 0 normally, vis 1
    (uniform target) when uniform_heatmaps_for_nan_keypoints is set
    (reference HeatmapDataset semantics)."""
    (visibility_data_dir / "nans.csv").write_text(
        "scorer,s,s,s,s\n"
        "bodyparts,kp1,kp1,kp2,kp2\n"
        "coords,x,y,x,y\n"
        "img01.png,24.0,24.0,,\n"
    )
    ds0 = HeatmapDataset(
        root_directory=str(visibility_data_dir), csv_path="nans.csv",
        image_resize_height=128, image_resize_width=128,
    )
    assert list(ds0[0]["visibility"]) == [2, 0]
    ds1 = HeatmapDataset(
        root_directory=str(visibility_data_dir), csv_path="nans.csv",
        image_resize_height=128, image_resize_width=128,
        uniform_heatmaps_for_nan_keypoints=True,
    )
    assert list(ds1[0]["visibility"]) == [2, 1]


def test_sample_bbox_defaults_to_full_frame(visibility_data_dir):
    ds = HeatmapDataset(
        root_directory=str(visibility_data_dir), csv_path="labels.csv",
        image_resize_height=128, image_resize_width=128,
    )
    # original image is 40 tall x 30 wide -> bbox [x, y, h, w]
    np.testing.assert_allclose(ds[0]["bbox"], [0.0, 0.0, 40.0, 30.0])


# -- resize-dims sweep (reference test_datasets.py:390-420) --------------------


@pytest.mark.parametrize(
    "rh,rw", [(128, 128), (128, 256), (256, 384)]
)
def test_resize_dims_sweep(visibility_data_dir, rh, rw):
    """Sample shapes, keypoint scaling, and heatmap geometry track
    rectangular resize dims. (The reference sweeps (64,64)/(480,640) too;
    this framework's config contract pins dims to multiples of 128 —
    datasets.py:256-260 — so the sweep stays on the supported lattice.)"""
    ds = HeatmapDataset(
        root_directory=str(visibility_data_dir), csv_path="labels.csv",
        image_resize_height=rh, image_resize_width=rw,
    )
    s = ds[0]
    assert s["images"].shape == (rh, rw, 3)
    # original images are 40 tall x 30 wide; CSV kp1 = (24, 24)
    np.testing.assert_allclose(
        ds.keypoints_resized(0)[0], [24.0 * rw / 30, 24.0 * rh / 40], rtol=1e-6
    )
    assert ds.output_shape == (rh // 4, rw // 4)


def test_base_and_heatmap_equal_sizes(visibility_data_dir):
    """BaseTrackingDataset and HeatmapDataset expose identical lengths and
    sample contracts on the same CSV (reference test_datasets.py:1363)."""
    from lightning_pose_tpu.data.datasets import BaseTrackingDataset

    kw = dict(
        root_directory=str(visibility_data_dir), csv_path="labels.csv",
        image_resize_height=128, image_resize_width=128,
    )
    base, heat = BaseTrackingDataset(**kw), HeatmapDataset(**kw)
    assert len(base) == len(heat) == 2
    sb, sh = base[0], heat[0]
    assert sb["images"].shape == sh["images"].shape
    np.testing.assert_allclose(sb["keypoints"], sh["keypoints"])
    np.testing.assert_array_equal(sb["visibility"], sh["visibility"])


# -- path-based calibration discovery (reference test_datasets.py:1017-1160) ---

_DISCOVERY_TOML = """
[cam_0]
name = "top"
size = [ 48, 40,]
matrix = [ [ 50.0, 0.0, 24.0,], [ 0.0, 50.0, 20.0,], [ 0.0, 0.0, 1.0,],]
distortions = [ 0.0,]
rotation = [ 0.0, 0.0, 0.0,]
translation = [ 0.0, 0.0, 10.0,]

[cam_1]
name = "bot"
size = [ 48, 40,]
matrix = [ [ 50.0, 0.0, 24.0,], [ 0.0, 50.0, 20.0,], [ 0.0, 0.0, 1.0,],]
distortions = [ 0.0,]
rotation = [ 1.0, 0.2, -0.1,]
translation = [ 0.1, -0.2, 9.0,]
"""


def _make_mv_dir(tmp_path, sessions=("sessA",), layout="labeled-data"):
    """Synthesize a tiny 2-view multiview dir: 2 frames per session,
    2 keypoints, views top/bot."""
    import pandas as pd

    root = tmp_path / "mvdisc"
    frames = []
    for sess in sessions:
        for i in range(2):
            frames.append((sess, f"img{i:02d}.png"))
    for view in ("top", "bot"):
        rows = {}
        for sess, fname in frames:
            rel = f"{layout}/{sess}_{view}/{fname}" if "_" != sess else fname
            _write_img(str(root / rel), h=40, w=48)
            rows[rel] = [24.0, 20.0, 10.0, 30.0]
        df = pd.DataFrame.from_dict(
            rows, orient="index",
            columns=pd.MultiIndex.from_product(
                [["s"], ["kp1", "kp2"], ["x", "y"]],
                names=["scorer", "bodyparts", "coords"],
            ).remove_unused_levels()[:4],
        )
        cols = pd.MultiIndex.from_tuples(
            [("s", "kp1", "x"), ("s", "kp1", "y"),
             ("s", "kp2", "x"), ("s", "kp2", "y")],
            names=["scorer", "bodyparts", "coords"],
        )
        df.columns = cols
        df.to_csv(root / f"{view}.csv")
    return root


def _mv_disc_cfg(cfg, root):
    c = cfg.copy()
    c.data.data_dir = str(root)
    c.data.view_names = ["top", "bot"]
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.num_keypoints = 2
    c.data.keypoint_names = None
    c.data.mirrored_column_matches = None
    c.data.columns_for_singleview_pca = None
    c.data.camera_params_file = None
    return c


def test_discovery_session_toml(cfg, tmp_path):
    """labeled-data/<session>_<view>/ frames pick up
    calibrations/<session>.toml (reference test_datasets.py:1042)."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    root = _make_mv_dir(tmp_path)
    (root / "calibrations").mkdir()
    (root / "calibrations" / "sessA.toml").write_text(_DISCOVERY_TOML)
    ds = MultiviewHeatmapDataset(_mv_disc_cfg(cfg, root), str(root))
    assert ds.is_calibrated
    s = ds[0]
    assert s["intrinsic_matrix"].shape == (2, 3, 3)
    assert s["extrinsic_matrix"].shape == (2, 3, 4)


def test_discovery_fallback_toml(cfg, tmp_path):
    """Without a per-session file, a root calibration.toml is used
    (reference test_datasets.py:1058)."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    root = _make_mv_dir(tmp_path)
    (root / "calibration.toml").write_text(_DISCOVERY_TOML)
    ds = MultiviewHeatmapDataset(_mv_disc_cfg(cfg, root), str(root))
    assert ds.is_calibrated


def test_discovery_no_calibration_is_uncalibrated(cfg, tmp_path):
    """No TOML anywhere -> dataset stays uncalibrated, no error
    (reference test_datasets.py:1072)."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    root = _make_mv_dir(tmp_path)
    ds = MultiviewHeatmapDataset(_mv_disc_cfg(cfg, root), str(root))
    assert not ds.is_calibrated
    assert "intrinsic_matrix" not in ds[0]


def test_discovery_multi_session(cfg, tmp_path):
    """Each session resolves its own calibrations/<session>.toml
    (reference test_datasets.py:1105)."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    root = _make_mv_dir(tmp_path, sessions=("sessA", "sessB"))
    (root / "calibrations").mkdir()
    (root / "calibrations" / "sessA.toml").write_text(_DISCOVERY_TOML)
    (root / "calibrations" / "sessB.toml").write_text(_DISCOVERY_TOML)
    ds = MultiviewHeatmapDataset(_mv_disc_cfg(cfg, root), str(root))
    assert ds.is_calibrated
    assert len(ds._calib_by_file) == 2
    assert len(set(ds._calib_file_per_frame)) == 2


def test_discovery_do_context_raises(cfg, tmp_path):
    """Discovered calibration + do_context is rejected (3D aug unsupported
    for context models; reference test_datasets.py:1149)."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    root = _make_mv_dir(tmp_path)
    (root / "calibration.toml").write_text(_DISCOVERY_TOML)
    with pytest.raises(ValueError, match="not supported for context"):
        MultiviewHeatmapDataset(_mv_disc_cfg(cfg, root), str(root),
                                do_context=True)


def test_discovery_folder_without_underscore_raises(cfg, tmp_path):
    """labeled-data folders must follow <session>_<view>
    (reference test_datasets.py:1140)."""
    import pandas as pd

    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    root = _make_mv_dir(tmp_path)
    # rewrite one view's paths to a folder with no underscore
    for view in ("top", "bot"):
        df = pd.read_csv(root / f"{view}.csv", header=[0, 1, 2], index_col=0)
        new_index = [p.replace(f"sessA_{view}", "nounderscore")
                     for p in df.index]
        for old, new in zip(df.index, new_index):
            dst = root / new
            dst.parent.mkdir(parents=True, exist_ok=True)
            os.replace(root / old, dst)
        df.index = pd.Index(new_index)
        df.to_csv(root / f"{view}.csv")
    with pytest.raises(ValueError, match="does not match expected pattern"):
        MultiviewHeatmapDataset(_mv_disc_cfg(cfg, root), str(root))


def test_discovery_path_without_labeled_data_raises(cfg, tmp_path):
    """Image paths outside labeled-data/ are a layout error
    (reference test_datasets.py:1131)."""
    from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset

    root = _make_mv_dir(tmp_path, layout="frames")
    with pytest.raises(ValueError, match="labeled-data"):
        MultiviewHeatmapDataset(_mv_disc_cfg(cfg, root), str(root))
