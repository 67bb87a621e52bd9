"""I420 -> RGB device conversion: parity vs cv2 and end-to-end keypoint
deviation of the half-bandwidth video-transfer path."""

import cv2
import numpy as np
import pytest


def test_i420_to_rgb_matches_cv2_on_real_frames(toy_data_dir):
    """Device conversion must match cv2.COLOR_YUV2RGB_I420 to rounding
    (+-2/255) on real video frames."""
    import os

    from lightning_pose_tpu.ops.yuv import i420_to_rgb

    cap = cv2.VideoCapture(
        os.path.join(toy_data_dir, "videos", "test_vid.mp4")
    )
    frames = []
    for _ in range(4):
        ret, f = cap.read()
        assert ret
        frames.append(
            cv2.resize(cv2.cvtColor(f, cv2.COLOR_BGR2RGB), (128, 128))
        )
    cap.release()

    yuv = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in frames])
    assert yuv.shape == (4, 192, 128)
    ours = np.asarray(i420_to_rgb(yuv))
    golden = np.stack(
        [cv2.cvtColor(y, cv2.COLOR_YUV2RGB_I420) for y in yuv]
    ).astype(np.float32)
    assert np.abs(ours - golden).max() <= 2.0
    # lossy chroma subsampling is bounded on natural frames
    rgb = np.stack(frames).astype(np.float32)
    assert np.abs(ours - rgb).mean() < 3.0


def test_i420_to_rgb_matches_cv2_on_synthetic():
    from lightning_pose_tpu.ops.yuv import i420_to_rgb

    rng = np.random.default_rng(0)
    # smooth image (avoid per-pixel chroma noise: we compare against cv2's
    # decode of the SAME I420 data, so noise is fine for the decode parity)
    rgb = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    yuv = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in rgb])
    ours = np.asarray(i420_to_rgb(yuv))
    golden = np.stack(
        [cv2.cvtColor(y, cv2.COLOR_YUV2RGB_I420) for y in yuv]
    ).astype(np.float32)
    assert np.abs(ours - golden).max() <= 2.0


def test_i420_normalized_matches_rgb_normalize():
    """The fused normalized output equals convert-then-normalize."""
    from lightning_pose_tpu.ops.preprocess import normalize_images
    from lightning_pose_tpu.ops.yuv import i420_to_normalized_rgb, i420_to_rgb

    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    yuv = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in rgb])
    fused = np.asarray(i420_to_normalized_rgb(yuv))
    manual = np.asarray(normalize_images(i420_to_rgb(yuv)))
    np.testing.assert_allclose(fused, manual, atol=1e-5)


def test_loader_yuv420_format(toy_data_dir):
    """yuv420 loader batches carry the I420 layout and decode back to the
    rgb loader's batches up to chroma rounding."""
    import os

    from lightning_pose_tpu.data.video import PredictVideoLoader
    from lightning_pose_tpu.ops.yuv import i420_to_rgb

    video = os.path.join(toy_data_dir, "videos", "test_vid.mp4")
    rgb_loader = PredictVideoLoader(
        video, sequence_length=8, resize_height=128, resize_width=128
    )
    yuv_loader = PredictVideoLoader(
        video, sequence_length=8, resize_height=128, resize_width=128,
        transfer_format="yuv420",
    )
    rgb_batch = next(iter(rgb_loader))
    yuv_batch = next(iter(yuv_loader))
    assert rgb_batch.shape == (8, 128, 128, 3)
    assert yuv_batch.shape == (8, 192, 128)
    assert yuv_batch.dtype == np.uint8
    back = np.asarray(i420_to_rgb(yuv_batch))
    assert np.abs(back - rgb_batch.astype(np.float32)).mean() < 3.0


def test_loader_transfer_format_validation(toy_data_dir):
    import os

    from lightning_pose_tpu.data.video import PredictVideoLoader

    video = os.path.join(toy_data_dir, "videos", "test_vid.mp4")
    with pytest.raises(ValueError, match="transfer_format"):
        PredictVideoLoader(
            video, sequence_length=8, resize_height=128, resize_width=128,
            transfer_format="nv12",
        )


@pytest.mark.slow
def test_yuv_video_inference_keypoint_deviation(cfg, tmp_path):
    """End-to-end: a trained model's video predictions through the yuv420
    transfer path deviate <1 px from the rgb path (the transfer is
    subsampled-chroma-lossless for 4:2:0 sources; this bounds the full
    pipeline including the extra convert round-trip)."""
    from lightning_pose_tpu.api.model import Model
    from lightning_pose_tpu.train import train

    c = cfg.copy()
    c.training.max_epochs = 2
    c.training.min_epochs = 2
    c.training.unfreezing_epoch = 0
    c.model.model_name = "yuv-e2e"
    c.eval.predict_vids_after_training = False
    train(c, model_dir=tmp_path, skip_evaluation=True)

    video = str(cfg.data.video_dir) + "/test_vid.mp4"
    m = Model.from_dir(tmp_path)
    m.cfg.eval.video_transfer_format = "rgb"
    df_rgb = m.predict_on_video_file(
        video, compute_metrics=False, output_dir=tmp_path / "rgb"
    ).predictions
    m.cfg.eval.video_transfer_format = "yuv420"
    df_yuv = m.predict_on_video_file(
        video, compute_metrics=False, output_dir=tmp_path / "yuv"
    ).predictions

    coords = df_rgb.columns.get_level_values("coords").isin(["x", "y"])
    dev = np.abs(
        df_rgb.loc[:, coords].to_numpy() - df_yuv.loc[:, coords].to_numpy()
    )
    assert np.nanmedian(dev) < 1.0
    assert np.nanquantile(dev, 0.95) < 3.0


def test_unlabeled_loader_yuv420(toy_data_dir):
    import os

    from lightning_pose_tpu.data.video import UnlabeledVideoLoader
    from lightning_pose_tpu.ops.yuv import i420_to_rgb

    video = os.path.join(toy_data_dir, "videos", "test_vid.mp4")
    rgb_loader = UnlabeledVideoLoader(
        [video], sequence_length=4, resize_height=128, resize_width=128,
        seed=7,
    )
    yuv_loader = UnlabeledVideoLoader(
        [video], sequence_length=4, resize_height=128, resize_width=128,
        seed=7, transfer_format="yuv420",
    )
    try:
        rgb_batch = next(rgb_loader)
        yuv_batch = next(yuv_loader)
        # same seeded window
        np.testing.assert_allclose(rgb_batch["bbox"], yuv_batch["bbox"])
        assert yuv_batch["frames"].shape == (4, 192, 128)
        back = np.asarray(i420_to_rgb(yuv_batch["frames"]))
        assert (
            np.abs(back - rgb_batch["frames"].astype(np.float32)).mean() < 3.0
        )
    finally:
        rgb_loader.close()
        yuv_loader.close()


@pytest.mark.slow
def test_train_semisupervised_yuv420_stream(cfg, tmp_path):
    """Semi-supervised training with the I420 unlabeled stream end-to-end
    (the train step converts 3-dim batches on device)."""
    from lightning_pose_tpu.train import train

    c = cfg.copy()
    c.model.losses_to_use = ["temporal"]
    c.model.model_name = "yuv-train"
    c.training.max_epochs = 1
    c.training.min_epochs = 1
    c.training.video_transfer_format = "yuv420"
    c.eval.predict_vids_after_training = False
    train(c, model_dir=tmp_path, skip_evaluation=True)

    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    assert ckpt_path_from_base_path(str(tmp_path), "yuv-train") is not None


@pytest.mark.slow
def test_multiview_video_predict_yuv420(cfg, mv_data_dir, tmp_path):
    """Multiview video prediction through the I420 transfer path: same
    CSVs/shapes as rgb, keypoints close on a shared random-init model."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.api.model import Model
    from lightning_pose_tpu.models.factory import get_model
    from lightning_pose_tpu.train import checkpoints as ckpt_utils
    from pathlib import Path

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
    c.model.model_name = "mv-yuv"
    c.dali.base.predict.sequence_length = 8

    module, _ = get_model(c, num_keypoints=7)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 128, 128, 3)), train=False
    )
    model_dir = tmp_path / "m"
    vdir = ckpt_utils.next_version_dir(str(model_dir), "mv-yuv")
    cdir = ckpt_utils.checkpoint_dir(vdir)
    ckpt_utils.save_checkpoint(
        f"{cdir}/epoch=0-step=0-best.ckpt",
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        step=0, epoch=0,
    )
    ckpt_utils.wait_for_saves()
    c.save(str(model_dir / "config.yaml"))

    videos = sorted(Path(mv_data_dir, "videos").glob("test_vid_*.mp4"))
    top = [v for v in videos if v.stem.endswith("_top")][0]
    bot = [v for v in videos if v.stem.endswith("_bot")][0]

    m = Model.from_dir(model_dir)
    m.cfg.eval.video_transfer_format = "rgb"
    rgb = m.predict_on_video_file_multiview(
        [str(top), str(bot)], compute_metrics=False
    ).predictions
    m.cfg.eval.video_transfer_format = "yuv420"
    yuv = m.predict_on_video_file_multiview(
        [str(top), str(bot)], compute_metrics=False
    ).predictions

    for view in ("top", "bot"):
        assert len(yuv[view]) == 60
        coords = rgb[view].columns.get_level_values("coords").isin(["x", "y"])
        dev = np.abs(
            rgb[view].loc[:, coords].to_numpy()
            - yuv[view].loc[:, coords].to_numpy()
        )
        # random-init heatmaps are near-flat; soft-argmax stays near the
        # map centroid, so the two transfer paths agree loosely
        assert np.nanmedian(dev) < 5.0


def test_exported_runtime_forces_rgb_transfer(cfg, tmp_path):
    """Exported XLA programs have fixed RGB input shapes; video prediction
    must fall back to rgb transfer even when cfg requests yuv420."""
    import jax
    import jax.numpy as jnp
    from pathlib import Path

    from lightning_pose_tpu.api.model import Model
    from lightning_pose_tpu.models.factory import get_model
    from lightning_pose_tpu.train import checkpoints as ckpt_utils

    c = cfg.copy()
    c.model.model_name = "yuv-exported"
    c.dali.base.predict.sequence_length = 16
    c.eval.video_transfer_format = "yuv420"
    module, _ = get_model(c)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
    )
    model_dir = tmp_path / "m"
    vdir = ckpt_utils.next_version_dir(str(model_dir), "yuv-exported")
    cdir = ckpt_utils.checkpoint_dir(vdir)
    ckpt_utils.save_checkpoint(
        f"{cdir}/epoch=0-step=0-best.ckpt",
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        step=0, epoch=0,
    )
    ckpt_utils.wait_for_saves()
    c.save(str(model_dir / "config.yaml"))

    m = Model.from_dir(model_dir)
    assert m._video_transfer_format() == "yuv420"
    m.export()
    m.use_exported_runtime()
    assert m._video_transfer_format() == "rgb"
    video = str(Path(cfg.data.video_dir) / "test_vid.mp4")
    res = m.predict_on_video_file(video, compute_metrics=False,
                                  output_dir=tmp_path / "out")
    assert len(res.predictions) == 994
