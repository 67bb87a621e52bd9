"""High-level ``Model`` API tests (reference tests/api/test_model.py:1-983).

The reference tests download pretrained model dirs from a GitHub release;
here (no egress) a loadable model directory is synthesized from a
random-init checkpoint, which exercises the identical ``from_dir`` ->
ckpt-discovery -> predict paths.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest


def _make_model_dir(tmp: Path, cfg, model_type="heatmap", backbone="resnet18"):
    """Build config.yaml + tb_logs ckpt layout the way train() would
    (mirrors bench.py's synthetic model dir)."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.models.factory import get_model
    from lightning_pose_tpu.train import checkpoints as ckpt_utils

    c = cfg.copy()
    c.model.model_type = model_type
    c.model.backbone = backbone
    c.model.model_name = "apitest"

    module, meta = get_model(c)
    h = int(c.data.image_resize_dims.height)
    w = int(c.data.image_resize_dims.width)
    if model_type == "heatmap_mhcrnn":
        dummy = jnp.zeros((1, 5, h, w, 3), dtype=jnp.float32)
    else:
        dummy = jnp.zeros((1, h, w, 3), dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), dummy, train=False)

    model_dir = tmp / f"model_{model_type}"
    version_dir = Path(
        ckpt_utils.next_version_dir(str(model_dir), c.model.model_name)
    )
    ckpt_dir = ckpt_utils.checkpoint_dir(str(version_dir))
    ckpt_utils.save_checkpoint(
        str(Path(ckpt_dir) / "epoch=1-step=10-best.ckpt"),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        step=10,
        epoch=1,
    )
    ckpt_utils.wait_for_saves()
    c.save(str(model_dir / "config.yaml"))
    return model_dir


@pytest.fixture(scope="module")
def model_dir(cfg, tmp_path_factory):
    return _make_model_dir(tmp_path_factory.mktemp("api"), cfg)


@pytest.fixture(scope="module")
def model(model_dir):
    from lightning_pose_tpu.api.model import Model

    return Model.from_dir(model_dir)


# -- constructors / discovery ------------------------------------------------


def test_from_dir_missing_config_raises(tmp_path):
    from lightning_pose_tpu.api.model import Model

    with pytest.raises(FileNotFoundError):
        Model.from_dir(tmp_path)


def test_from_dir2_applies_overrides(model_dir):
    from lightning_pose_tpu.api.model import Model

    m = Model.from_dir2(
        model_dir, hydra_overrides=["training.train_batch_size=7"]
    )
    assert int(m.cfg.training.train_batch_size) == 7


def test_ckpt_path_discovery(model):
    # tb_logs/<name>/version_0/checkpoints/epoch=1-step=10-best.ckpt
    assert model.ckpt_path is not None
    assert model.ckpt_path.endswith("epoch=1-step=10-best.ckpt")


def test_output_dir_conventions(model, model_dir):
    # reference model.py:706-728 directory contract
    assert model.image_preds_dir() == Path(model_dir) / "image_preds"
    assert model.video_preds_dir() == Path(model_dir) / "video_preds"
    assert (
        model.labeled_videos_dir()
        == Path(model_dir) / "video_preds" / "labeled_videos"
    )


def test_missing_checkpoint_raises(cfg, tmp_path):
    from lightning_pose_tpu.api.model import Model

    c = cfg.copy()
    c.model.model_name = "nockpt"
    no_ckpt_dir = tmp_path / "model"
    no_ckpt_dir.mkdir()
    c.save(str(no_ckpt_dir / "config.yaml"))
    m = Model.from_dir(no_ckpt_dir)
    with pytest.raises(FileNotFoundError):
        m.predict_frame(np.zeros((32, 32, 3), dtype=np.uint8))


def test_invalid_precision_raises(model_dir):
    from lightning_pose_tpu.api.model import Model

    m = Model.from_dir(model_dir, precision="int8")
    with pytest.raises(ValueError, match="precision"):
        m.predict_frame(np.zeros((32, 32, 3), dtype=np.uint8))


# -- predict_frame -----------------------------------------------------------


def test_predict_frame_shapes_and_dtypes(model, cfg):
    frame = np.random.default_rng(0).integers(
        0, 255, size=(406, 396, 3), dtype=np.uint8
    )
    out = model.predict_frame(frame)
    k = int(cfg.data.num_keypoints)
    assert out["keypoints"].shape == (k, 2)
    assert out["confidence"].shape == (k,)
    assert out["keypoints"].dtype == np.float32
    assert out["confidence"].dtype == np.float32
    # keypoints live in original-frame pixel coords
    kp = out["keypoints"]
    assert np.all(kp[:, 0] >= -1) and np.all(kp[:, 0] <= 396 + 1)
    assert np.all(kp[:, 1] >= -1) and np.all(kp[:, 1] <= 406 + 1)


def test_predict_frame_bbox_remap(model):
    frame = np.random.default_rng(1).integers(
        0, 255, size=(406, 396, 3), dtype=np.uint8
    )
    bbox = (100, 50, 128, 160)  # x, y, w, h
    out = model.predict_frame(frame, bbox=bbox)
    kp = out["keypoints"]
    # all keypoints must land inside the crop region in frame coords
    assert np.all(kp[:, 0] >= bbox[0] - 1)
    assert np.all(kp[:, 0] <= bbox[0] + bbox[2] + 1)
    assert np.all(kp[:, 1] >= bbox[1] - 1)
    assert np.all(kp[:, 1] <= bbox[1] + bbox[3] + 1)


def test_predict_frame_input_validation(model):
    with pytest.raises(ValueError, match="uint8"):
        model.predict_frame(np.zeros((32, 32, 3), dtype=np.float32))
    with pytest.raises(ValueError, match="shape"):
        model.predict_frame(np.zeros((32, 32), dtype=np.uint8))
    with pytest.raises(ValueError, match="bbox"):
        model.predict_frame(
            np.zeros((64, 64, 3), dtype=np.uint8), bbox=(-1, 0, 10, 10)
        )
    with pytest.raises(ValueError, match="bbox"):
        model.predict_frame(
            np.zeros((64, 64, 3), dtype=np.uint8), bbox=(0, 0, 0, 10)
        )


def test_predict_frame_context_model_requires_stack(cfg, tmp_path):
    from lightning_pose_tpu.api.model import Model

    mdir = _make_model_dir(tmp_path, cfg, model_type="heatmap_mhcrnn")
    m = Model.from_dir(mdir)
    with pytest.raises(ValueError, match="T, H, W, 3"):
        m.predict_frame(np.zeros((64, 64, 3), dtype=np.uint8))
    out = m.predict_frame(
        np.random.default_rng(2).integers(
            0, 255, size=(5, 406, 396, 3), dtype=np.uint8
        )
    )
    assert out["keypoints"].shape == (int(cfg.data.num_keypoints), 2)


def test_predict_frame_fp32_bf16_agree_loosely(model_dir):
    """bf16 and fp32 runtimes decode to nearby keypoints on the same
    random-init model (precision plumbing sanity)."""
    from lightning_pose_tpu.api.model import Model

    frame = np.random.default_rng(3).integers(
        0, 255, size=(256, 256, 3), dtype=np.uint8
    )
    kp32 = Model.from_dir(model_dir, precision="fp32").predict_frame(frame)
    kp16 = Model.from_dir(model_dir, precision="bf16").predict_frame(frame)
    assert kp32["keypoints"].shape == kp16["keypoints"].shape
    # random-init heatmaps are near-flat so argmax sites can differ; demand
    # agreement only on average location scale, not per-point identity
    assert (
        np.nanmedian(
            np.abs(kp32["keypoints"] - kp16["keypoints"])
        )
        < 256
    )


# -- predict_on_label_csv ----------------------------------------------------


def test_predict_on_label_csv_artifact_contract(model, cfg, toy_data_dir):
    import pandas as pd

    result = model.predict_on_label_csv(
        Path(toy_data_dir) / "CollectedData.csv", compute_metrics=True
    )
    df = result.predictions
    # reference API contract: a PredictionResult with metrics + to_dict()
    assert result.metrics is not None
    assert result.metrics.pixel_error_df is not None
    d = result.to_dict()
    assert d["x"].shape == d["confidence"].shape
    assert d["pixel_error"] is not None
    labels = pd.read_csv(
        Path(toy_data_dir) / "CollectedData.csv", header=[0, 1, 2], index_col=0
    )
    assert len(df) == len(labels)

    out_dir = model.image_preds_dir() / "CollectedData.csv"
    preds_file = out_dir / "predictions.csv"
    assert preds_file.exists()
    # DLC 3-level header round-trips
    reread = pd.read_csv(preds_file, header=[0, 1, 2], index_col=0)
    assert len(reread) == len(labels)
    assert "likelihood" in reread.columns.get_level_values("coords")
    # pixel-error side CSV (labeled input -> pixel_error metric,
    # reference metrics.py:187-240)
    assert (out_dir / "predictions_pixel_error.csv").exists()


def test_predict_on_label_csv_custom_output_dir(model, toy_data_dir, tmp_path):
    out = tmp_path / "custom_preds"
    model.predict_on_label_csv(
        Path(toy_data_dir) / "CollectedData.csv",
        compute_metrics=False,
        output_dir=out,
    )
    assert (out / "predictions.csv").exists()


def test_predict_on_label_csv_multiview_guard(cfg, mv_data_dir, tmp_path):
    """Single-view CSV prediction on a multiview model raises with guidance
    (multiview dispatch contract, reference model.py:1022-1027)."""
    from lightning_pose_tpu.api.model import Model

    c = cfg.copy()
    c.data.data_dir = mv_data_dir
    c.data.view_names = ["top", "bot"]
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = [
        "paw1LH", "paw2LF", "paw3RF", "paw4RH", "tailBase", "tailMid", "nose",
    ]
    c.data.mirrored_column_matches = None
    c.data.columns_for_singleview_pca = None
    c.model.model_name = "mvguard"
    mdir = tmp_path / "mv_model"
    mdir.mkdir()
    c.save(str(mdir / "config.yaml"))
    m = Model.from_dir(mdir)
    with pytest.raises(ValueError, match="multiview"):
        m.predict_on_label_csv("top.csv")


# -- export / exported runtime ----------------------------------------------


def test_export_and_load_roundtrip(model, cfg, tmp_path):
    """jax.export serialization round-trips and reproduces the eager
    program's outputs exactly (the ONNX/ORT analog, reference
    model.py:615-704)."""
    from lightning_pose_tpu.api.model import Model

    path = model.export(output_dir=tmp_path / "exports")
    assert Path(path).exists()
    assert Path(path).suffix == ".jax_export"

    fn = Model.load_exported(path)
    seq_len = int(cfg.dali.base.predict.sequence_length)
    h = int(cfg.data.image_resize_dims.height)
    w = int(cfg.data.image_resize_dims.width)
    images = np.random.default_rng(4).integers(
        0, 255, size=(seq_len, h, w, 3), dtype=np.uint8
    )
    bbox = np.tile(
        np.array([0.0, 0.0, 406.0, 396.0], dtype=np.float32), (seq_len, 1)
    )
    kp_exp, conf_exp = fn(images, bbox)
    model._load()
    kp_eager, conf_eager = model._predict_fn(model._state, images, bbox)
    np.testing.assert_allclose(
        np.asarray(kp_exp), np.asarray(kp_eager), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(conf_exp), np.asarray(conf_eager), rtol=1e-5, atol=1e-4
    )


def test_export_roundtrip_multiview(cfg, mv_data_dir, tmp_path):
    """Export traces multiview shapes (T, V, H, W, 3) and round-trips
    (reference traces its ONNX export per model shape, model.py:615-704).
    Uses a plain heatmap tracker on 2-view data (views fold into batch)."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.api.model import Model
    from lightning_pose_tpu.models.factory import get_model
    from lightning_pose_tpu.train import checkpoints as ckpt_utils

    c = cfg.copy()
    c.data.data_dir = mv_data_dir
    c.data.video_dir = f"{mv_data_dir}/videos"
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.view_names = ["top", "bot"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = None
    c.data.mirrored_column_matches = None
    c.data.columns_for_singleview_pca = None
    c.model.model_type = "heatmap"
    c.model.backbone = "resnet18"
    c.model.model_name = "mv-export"
    c.dali.base.predict.sequence_length = 4

    module, _meta = get_model(c, num_keypoints=7)
    variables = module.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 128, 128, 3), dtype=jnp.float32),
        train=False,
    )
    model_dir = tmp_path / "mv_export_model"
    version_dir = Path(
        ckpt_utils.next_version_dir(str(model_dir), c.model.model_name)
    )
    ckpt_dir = ckpt_utils.checkpoint_dir(str(version_dir))
    ckpt_utils.save_checkpoint(
        str(Path(ckpt_dir) / "epoch=0-step=0-best.ckpt"),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        step=0, epoch=0,
    )
    ckpt_utils.wait_for_saves()
    c.save(str(model_dir / "config.yaml"))

    m = Model.from_dir(model_dir)
    m.compile()  # multiview canonical shape compiles
    path = m.export(output_dir=tmp_path / "exports")
    fn = Model.load_exported(path)

    images = np.random.default_rng(4).integers(
        0, 255, size=(4, 2, 128, 128, 3), dtype=np.uint8
    )
    bbox = np.tile(
        np.array([0, 0, 168, 396, 0, 0, 238, 396], dtype=np.float32), (4, 1)
    )
    kp_exp, conf_exp = fn(images, bbox)
    assert np.asarray(kp_exp).shape == (4, 28)  # view-major 2 views x 7 kps
    kp_eager, conf_eager = m._predict_fn(m._state, images, bbox)
    np.testing.assert_allclose(
        np.asarray(kp_exp), np.asarray(kp_eager), rtol=1e-5, atol=1e-4
    )


def test_use_exported_runtime_shape_guard(model_dir, cfg, tmp_path):
    from lightning_pose_tpu.api.model import Model

    m = Model.from_dir(model_dir)
    export_dir = Path(model_dir) / "exports_xla"
    if export_dir.exists():
        shutil.rmtree(export_dir)
    m.export()  # default location
    m.use_exported_runtime()
    # wrong batch shape -> helpful error, not a crash
    with pytest.raises(ValueError, match="exported program expects"):
        m._predict_fn(
            m._state,
            np.zeros((3, 128, 128, 3), dtype=np.uint8),
            np.zeros((3, 4), dtype=np.float32),
        )


def test_use_exported_runtime_missing_export_raises(cfg, tmp_path):
    from lightning_pose_tpu.api.model import Model

    mdir = _make_model_dir(tmp_path, cfg)
    m = Model.from_dir(mdir)
    with pytest.raises(FileNotFoundError, match="jax_export"):
        m.use_exported_runtime()


def test_compile_triggers_jit(model):
    # smoke: compile() must run the canonical video-shape program
    model.compile()
    assert model._predict_fn is not None


def test_predict_on_label_csv_set_column_semantics(model, toy_data_dir, tmp_path):
    """Default: every frame marked 'train' (reference model.py:1016-1019
    train_prob=1 override); add_train_val_test_set=True recreates the real
    seeded splits."""
    df_default = model.predict_on_label_csv(
        str(Path(toy_data_dir) / "CollectedData.csv"),
        compute_metrics=False,
        output_dir=tmp_path / "default",
    ).predictions
    sets = df_default["set"].to_numpy().ravel()
    # train_prob=1 marks everything train except the single forced
    # validation frame (the reference's split_sizes_from_probabilities
    # enforces >=1 val sample, reference data/utils.py:63-67)
    assert (sets == "train").sum() == len(sets) - 1
    assert (sets == "validation").sum() == 1

    df_split = model.predict_on_label_csv(
        str(Path(toy_data_dir) / "CollectedData.csv"),
        compute_metrics=False,
        add_train_val_test_set=True,
        output_dir=tmp_path / "split",
    ).predictions
    sets2 = set(np.unique(df_split["set"].to_numpy().ravel()))
    assert "train" in sets2 and ("validation" in sets2 or "test" in sets2)


def test_predict_on_label_csv_bbox_file(model, toy_data_dir, tmp_path):
    """bbox_file crops each frame before inference and remaps predictions
    into original-frame coordinates (reference model.py:975-980)."""
    import pandas as pd

    labels = pd.read_csv(
        Path(toy_data_dir) / "CollectedData.csv", header=[0, 1, 2], index_col=0
    )
    bbox = pd.DataFrame(
        {
            "x": [60] * len(labels), "y": [40] * len(labels),
            "h": [256] * len(labels), "w": [256] * len(labels),
        },
        index=labels.index,
    )
    bbox_file = tmp_path / "bboxes.csv"
    bbox.to_csv(bbox_file)

    df = model.predict_on_label_csv(
        Path(toy_data_dir) / "CollectedData.csv",
        compute_metrics=False,
        output_dir=tmp_path / "preds",
        bbox_file=bbox_file,
    ).predictions
    xs = df.loc[:, df.columns.get_level_values("coords") == "x"].to_numpy()
    ys = df.loc[:, df.columns.get_level_values("coords") == "y"].to_numpy()
    assert np.nanmin(xs) >= 60 - 1 and np.nanmax(xs) <= 60 + 256 + 1
    assert np.nanmin(ys) >= 40 - 1 and np.nanmax(ys) <= 40 + 256 + 1


def test_predict_on_video_file_multiview(cfg, mv_data_dir, tmp_path):
    """Frame-synced multiview video inference through the Model API:
    per-view CSVs + a MultiviewPredictionResult (reference model.py:1225)."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.api.model import Model
    from lightning_pose_tpu.models.factory import get_model
    from lightning_pose_tpu.train import checkpoints as ckpt_utils

    c = cfg.copy()
    c.data.data_dir = mv_data_dir
    c.data.video_dir = f"{mv_data_dir}/videos"
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.view_names = ["top", "bot"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = [
        "paw1LH", "paw2LF", "paw3RF", "paw4RH", "tailBase", "tailMid", "nose",
    ]
    c.data.mirrored_column_matches = None
    c.data.columns_for_singleview_pca = None
    c.model.model_type = "heatmap_multiview"
    c.model.backbone = "vits_dino"
    c.model.model_name = "mv-api"
    c.dali.base.predict.sequence_length = 8

    module, _meta = get_model(c, num_keypoints=7)
    dummy = jnp.zeros((1, 2, 128, 128, 3), dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), dummy, train=False)
    model_dir = tmp_path / "mv_model"
    version_dir = Path(
        ckpt_utils.next_version_dir(str(model_dir), c.model.model_name)
    )
    ckpt_dir = ckpt_utils.checkpoint_dir(str(version_dir))
    ckpt_utils.save_checkpoint(
        str(Path(ckpt_dir) / "epoch=0-step=0-best.ckpt"),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        step=0, epoch=0,
    )
    ckpt_utils.wait_for_saves()
    c.save(str(model_dir / "config.yaml"))

    m = Model.from_dir(model_dir)
    videos = sorted(Path(mv_data_dir, "videos").glob("test_vid_*.mp4"))
    top = [v for v in videos if v.stem.endswith("_top")]
    bot = [v for v in videos if v.stem.endswith("_bot")]
    assert top and bot
    result = m.predict_on_video_file_multiview(
        [str(top[0]), str(bot[0])], compute_metrics=True
    )
    assert set(result.predictions.keys()) == {"top", "bot"}
    for view, video in zip(["top", "bot"], [top[0], bot[0]]):
        df = result.predictions[view]
        assert len(df) == 60  # fixture videos are 60 frames
        csv = Path(model_dir) / "video_preds" / (video.stem + ".csv")
        assert csv.exists()
    # temporal-norm metric computed per view
    assert result.metrics is not None
    assert result.metrics["top"].temporal_norm_df is not None

    # output_dir override + App progress file (reference model.py:1225-1232)
    import json

    out_dir = model_dir / "custom_mv_out"
    progress = model_dir / "mv_progress.json"
    result2 = m.predict_on_video_file_multiview(
        [str(top[0]), str(bot[0])], compute_metrics=False,
        output_dir=out_dir, progress_file=progress,
    )
    assert (out_dir / (top[0].stem + ".csv")).exists()
    payload = json.loads(progress.read_text())
    assert payload["completed"] == payload["total"] > 0
    assert len(result2.predictions["top"]) == 60


def test_predict_on_video_file_bbox_args(model, tmp_path):
    """bbox_file is the reference's API surface (model.py:1146); bbox_df is
    the in-memory extra — passing both raises."""
    import pandas as pd

    bbox_file = tmp_path / "b_bbox.csv"
    pd.DataFrame({"x": [0], "y": [0], "h": [64], "w": [64]}).to_csv(bbox_file)
    with pytest.raises(ValueError, match="not both"):
        model.predict_on_video_file(
            "nonexistent.mp4",
            bbox_file=bbox_file,
            bbox_df=pd.read_csv(bbox_file, index_col=0),
        )


def test_predict_frame_bbox_clipping(model):
    """A bbox extending past the frame edge is clipped silently; remapped
    keypoints stay within the frame (reference test_model.py:255-279)."""
    rng = np.random.default_rng(3)
    frame = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8).astype(np.uint8)
    # extends 60px past the right edge: requested width 200, actual 140
    result = model.predict_frame(frame, bbox=(500, 100, 200, 150))
    kp, conf = result["keypoints"], result["confidence"]
    assert kp.dtype == np.float32 and conf.dtype == np.float32
    assert kp.ndim == 2 and kp.shape[1] == 2
    assert conf.shape[0] == kp.shape[0]
    assert np.all(conf >= 0) and np.all(conf <= 1)
    # predictions live inside the clipped crop, hence inside the frame
    assert np.all(kp[:, 0] >= 500 - 1) and np.all(kp[:, 0] <= 641)
    assert np.all(kp[:, 1] >= 100 - 1) and np.all(kp[:, 1] <= 481)


def test_predict_on_label_csv_does_not_mutate_cfg(model, toy_data_dir, tmp_path):
    """The train_prob/val_prob override used to mark every frame 'train'
    must not leak into the live model config (reference
    test_model.py:377-407)."""
    def snapshot():
        d = model.cfg.to_dict(resolve=True)
        d.pop("hydra", None)  # ${now:} interpolation re-resolves each call
        return d

    before = snapshot()
    model.predict_on_label_csv(
        "CollectedData.csv",
        data_dir=toy_data_dir,
        compute_metrics=False,
        output_dir=tmp_path / "noleak",
    )
    assert snapshot() == before


def test_multiview_predict_wrong_count_raises(cfg, mv_data_dir, tmp_path):
    """Wrong per-view CSV/video counts raise before any compute
    (reference test_model.py:338-355)."""
    from lightning_pose_tpu.api.model import Model

    c = cfg.copy()
    c.data.data_dir = mv_data_dir
    c.data.view_names = ["top", "bot"]
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = [
        "paw1LH", "paw2LF", "paw3RF", "paw4RH", "tailBase", "tailMid", "nose",
    ]
    c.data.mirrored_column_matches = None
    c.data.columns_for_singleview_pca = None
    c.model.model_name = "mvcount"
    mdir = tmp_path / "mv_model"
    mdir.mkdir()
    c.save(str(mdir / "config.yaml"))
    m = Model.from_dir(mdir)
    with pytest.raises(ValueError, match="views"):
        m.predict_on_label_csv_multiview(["top.csv"])
    with pytest.raises(ValueError, match="views"):
        m.predict_on_video_file_multiview(["only_one.mp4"])


def test_singleview_model_rejects_multiview_predict(model):
    """Multiview entry points raise on a single-view model (reference
    test_model.py:333-348)."""
    with pytest.raises(ValueError, match="single-view"):
        model.predict_on_label_csv_multiview(["a.csv", "b.csv"])
    with pytest.raises(ValueError, match="single-view"):
        model.predict_on_video_file_multiview(["a.mp4", "b.mp4"])


def test_predict_ignores_training_augmentation(cfg, toy_data_dir, tmp_path):
    """Prediction always runs the default (resize-only) pipeline no matter
    what ``training.imgaug`` says — the reference rebuilds the datamodule
    with imgaug reset to default at predict time (reference
    test_model.py:361-376)."""
    from lightning_pose_tpu.api.model import Model

    mdir = _make_model_dir(tmp_path, cfg)
    plain = Model.from_dir(mdir)
    augd = Model.from_dir2(mdir, ["training.imgaug=dlc"])
    csv = Path(toy_data_dir) / "CollectedData.csv"
    r0 = plain.predict_on_label_csv(
        csv, compute_metrics=False, output_dir=tmp_path / "p0"
    )
    r1 = augd.predict_on_label_csv(
        csv, compute_metrics=False, output_dir=tmp_path / "p1"
    )
    np.testing.assert_array_equal(
        r0.predictions.to_numpy(), r1.predictions.to_numpy()
    )


def test_use_exported_runtime_multiple_exports_raises(cfg, tmp_path):
    """Ambiguous export dirs must raise, matching the reference's
    multiple-exports guard (reference test_model.py:636-644)."""
    from lightning_pose_tpu.api.model import Model

    mdir = _make_model_dir(tmp_path, cfg)
    exports = mdir / "exports_xla"
    exports.mkdir()
    (exports / "a.jax_export").write_bytes(b"x")
    (exports / "b.jax_export").write_bytes(b"x")
    m = Model.from_dir(mdir)
    with pytest.raises(FileNotFoundError, match="exactly one"):
        m.use_exported_runtime()


def test_compile_is_idempotent(model, toy_data_dir, tmp_path):
    """compile() twice then predict still works (reference
    test_model.py:424-439)."""
    model.compile()
    model.compile()
    r = model.predict_on_label_csv(
        Path(toy_data_dir) / "CollectedData.csv",
        compute_metrics=False,
        output_dir=tmp_path / "out",
    )
    assert len(r.predictions) > 0


def test_predict_on_video_generates_labeled_video(model, tmp_path):
    """generate_labeled_video writes a playable overlay mp4 with one frame
    per prediction at original resolution (reference predictions.py:576-713
    via predict_on_video_file; failures in the renderer are swallowed with
    a warning, so the artifact itself must be asserted)."""
    import cv2

    vid = tmp_path / "tiny.mp4"
    wr = cv2.VideoWriter(
        str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (80, 60)
    )
    rng = np.random.default_rng(0)
    n = 40
    for _ in range(n):
        wr.write(rng.integers(0, 255, (60, 80, 3), dtype=np.uint8))
    wr.release()

    out = tmp_path / "preds"
    result = model.predict_on_video_file(
        str(vid), output_dir=str(out), compute_metrics=False,
        generate_labeled_video=True,
    )
    assert len(result.predictions) == n
    labeled = out / "labeled_videos" / "tiny_labeled.mp4"
    assert labeled.exists(), "labeled video was not written"
    cap = cv2.VideoCapture(str(labeled))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == n
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 80
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 60
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape == (60, 80, 3)
