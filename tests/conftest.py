"""Test fixtures.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path). This mirrors the reference's CPU-CI tier (reference
.github/workflows/tests_cpu.yml) while adding device-count coverage.
"""

import os

# must be set before jax initializes a backend; the axon TPU plugin
# overrides the JAX_PLATFORMS env var, so also force it via jax.config
os.environ["JAX_PLATFORMS"] = "cpu"
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: reruns of the suite skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/lp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA_DIR = "/root/reference/data/mirror-mouse-example"


@pytest.fixture(scope="session")
def toy_data_dir() -> str:
    if not os.path.isdir(REFERENCE_DATA_DIR):
        pytest.skip("mirror-mouse example data not available")
    return REFERENCE_DATA_DIR


@pytest.fixture(scope="session")
def cfg(toy_data_dir):
    """Config mirroring the reference mirror-mouse example config with
    shrunken dims/batches for fast tests (reference tests/conftest.py:65-78)."""
    from lightning_pose_tpu.config import load_config

    cfg = load_config()
    cfg.data.data_dir = toy_data_dir
    cfg.data.video_dir = os.path.join(toy_data_dir, "videos")
    cfg.data.csv_file = "CollectedData.csv"
    cfg.data.num_keypoints = 17
    cfg.data.keypoint_names = [
        "paw1LH_top", "paw2LF_top", "paw3RF_top", "paw4RH_top", "tailBase_top",
        "tailMid_top", "nose_top", "obs_top", "paw1LH_bot", "paw2LF_bot",
        "paw3RF_bot", "paw4RH_bot", "tailBase_bot", "tailMid_bot", "nose_bot",
        "obsHigh_bot", "obsLow_bot",
    ]
    cfg.data.image_resize_dims.height = 128
    cfg.data.image_resize_dims.width = 128
    cfg.data.mirrored_column_matches = [
        [0, 1, 2, 3, 4, 5, 6],
        [8, 9, 10, 11, 12, 13, 14],
    ]
    cfg.data.columns_for_singleview_pca = [0, 1, 2, 3, 4, 5, 6]
    cfg.training.train_batch_size = 2
    cfg.training.val_batch_size = 4
    cfg.training.test_batch_size = 4
    cfg.training.train_prob = 0.8
    cfg.training.val_prob = 0.1
    cfg.training.train_frames = 1
    cfg.training.imgaug = "dlc"
    cfg.training.max_epochs = 2
    cfg.training.min_epochs = 2
    cfg.training.unfreezing_epoch = 1
    cfg.training.check_val_every_n_epoch = 1
    # keep milestones within max_epochs (same idea as reference
    # test_train.py:37; [1] because _small_train_cfg shrinks max_epochs to 1)
    cfg.training.lr_scheduler_params.multisteplr.milestones = [1]
    cfg.training.rng_seed_data_pt = 42
    cfg.training.rng_seed_model_pt = 44
    cfg.model.model_type = "heatmap"
    cfg.model.backbone = "resnet18"
    cfg.model.losses_to_use = []
    cfg.dali.base.train.sequence_length = 8
    cfg.dali.base.predict.sequence_length = 16
    cfg.dali.context.train.batch_size = 8
    cfg.dali.context.predict.sequence_length = 16
    return cfg


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def mv_data_dir(toy_data_dir, tmp_path_factory) -> str:
    """Synthesize a 2-view dataset by splitting mirror-mouse at y=168
    (mirrors reference tests/conftest.py:107-198; cv2 instead of ffmpeg)."""
    import cv2
    import pandas as pd

    out = str(tmp_path_factory.mktemp("mv_data"))
    y_split = 168
    os.makedirs(os.path.join(out, "labeled-data", "example_top"), exist_ok=True)
    os.makedirs(os.path.join(out, "labeled-data", "example_bot"), exist_ok=True)
    os.makedirs(os.path.join(out, "videos"), exist_ok=True)

    src_ld = os.path.join(toy_data_dir, "labeled-data")
    for frame in os.listdir(src_ld):
        img = cv2.imread(os.path.join(src_ld, frame))
        cv2.imwrite(os.path.join(out, "labeled-data", "example_top", frame),
                    img[:y_split])
        cv2.imwrite(os.path.join(out, "labeled-data", "example_bot", frame),
                    img[y_split:])

    for video in os.listdir(os.path.join(toy_data_dir, "videos")):
        cap = cv2.VideoCapture(os.path.join(toy_data_dir, "videos", video))
        fps = cap.get(cv2.CAP_PROP_FPS)
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        four = cv2.VideoWriter_fourcc(*"mp4v")
        wt = cv2.VideoWriter(
            os.path.join(out, "videos", video.replace(".mp4", "_top.mp4")),
            four, fps, (w, y_split))
        wb = cv2.VideoWriter(
            os.path.join(out, "videos", video.replace(".mp4", "_bot.mp4")),
            four, fps, (w, h - y_split))
        n = 0
        while n < 60:  # short test videos
            ret, frame = cap.read()
            if not ret:
                break
            wt.write(frame[:y_split]); wb.write(frame[y_split:]); n += 1
        cap.release(); wt.release(); wb.release()

    df_og = pd.read_csv(os.path.join(toy_data_dir, "CollectedData.csv"),
                        header=[0, 1, 2], index_col=0)
    df_top = df_og.filter(regex="_top").drop(columns=["obs_top"], level=1)
    df_bot = df_og.filter(regex="_bot").drop(
        columns=["obsHigh_bot", "obsLow_bot"], level=1)
    df_bot.loc[:, df_bot.columns.get_level_values("coords") == "y"] -= y_split
    df_top.index = pd.Index([
        "/".join([d.split("/")[0], "example_top", d.split("/")[1]])
        for d in df_top.index])
    df_bot.index = pd.Index([
        "/".join([d.split("/")[0], "example_bot", d.split("/")[1]])
        for d in df_bot.index])
    df_top.columns = pd.MultiIndex.from_tuples(
        [(a, b.replace("_top", ""), c) for a, b, c in df_top.columns],
        names=df_top.columns.names)
    df_bot.columns = pd.MultiIndex.from_tuples(
        [(a, b.replace("_bot", ""), c) for a, b, c in df_bot.columns],
        names=df_bot.columns.names)
    df_top.to_csv(os.path.join(out, "top.csv"))
    df_bot.to_csv(os.path.join(out, "bot.csv"))
    return out
