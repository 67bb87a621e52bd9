"""End-to-end training tests: artifact contract + multichip data
parallelism (mirroring reference tests/test_train.py:51-224)."""

import os

import numpy as np
import pytest


def _small_train_cfg(cfg, model_name, **extra):
    c = cfg.copy()
    c.training.max_epochs = 1
    c.training.min_epochs = 1
    c.training.check_val_every_n_epoch = 1
    c.training.unfreezing_epoch = 0
    c.training.train_batch_size = 4
    c.training.train_frames = 8
    c.training.imgaug = "default"
    c.model.model_name = model_name
    c.model.backbone = "resnet18"
    c.eval.predict_vids_after_training = False
    for k, v in extra.items():
        c.update_at(k, v)
    return c


@pytest.mark.slow
def test_train_artifact_contract(cfg, tmp_path):
    """train() writes the full reference artifact contract
    (reference test_train.py:51-165)."""
    import json

    from lightning_pose_tpu.train import train

    c = _small_train_cfg(cfg, "e2e-test")
    model = train(c, model_dir=tmp_path)

    assert (tmp_path / "config.yaml").exists()
    assert (tmp_path / "CollectedData.csv").exists()
    assert (tmp_path / "predictions.csv").exists()
    assert (tmp_path / "predictions_pixel_error.csv").exists()
    assert (tmp_path / "image_preds" / "CollectedData.csv" / "predictions.csv").exists()

    status = json.loads((tmp_path / "train_status.json").read_text())
    assert status["status"] == "COMPLETED"

    # checkpoint discovery contract
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    ckpt = ckpt_path_from_base_path(str(tmp_path), "e2e-test")
    assert ckpt is not None and ckpt.endswith("-best.ckpt")

    # predictions CSV schema
    import pandas as pd

    df = pd.read_csv(tmp_path / "predictions.csv", header=[0, 1, 2], index_col=0)
    assert df.shape[0] == 90
    assert df.keys()[-1][0] == "set"
    sets = df.iloc[:, -1].to_numpy()
    assert set(np.unique(sets)) <= {"train", "validation", "test", "unused"}

    # Model API can reload the trained directory
    from lightning_pose_tpu.api.model import Model

    m = Model.from_dir(tmp_path)
    result = m.predict_frame(np.zeros((406, 396, 3), dtype=np.uint8))
    assert result["keypoints"].shape == (17, 2)
    assert result["confidence"].shape == (17,)
    # bbox crop path remaps back to original coordinates
    result = m.predict_frame(
        np.zeros((406, 396, 3), dtype=np.uint8), bbox=(50, 40, 200, 300)
    )
    assert result["keypoints"].shape == (17, 2)

    # serialized-XLA export round trip matches the live prediction program
    # (the reference's ONNX export/runtime contract, model.py:615-704)
    path = m.export(output_dir=tmp_path / "exports_xla")
    fn = Model.load_exported(path)
    seq_len = int(m.cfg.dali.base.predict.sequence_length)
    h = int(m.cfg.data.image_resize_dims.height)
    w = int(m.cfg.data.image_resize_dims.width)
    rng_np = np.random.default_rng(0)
    imgs = rng_np.integers(0, 256, (seq_len, h, w, 3)).astype(np.uint8)
    bbox = np.tile(
        np.array([0.0, 0.0, 406.0, 396.0], np.float32), (seq_len, 1)
    )
    kp_exp, conf_exp = fn(imgs, bbox)
    kp_live, conf_live = m._predict_fn(m._state, imgs, bbox)
    np.testing.assert_allclose(
        np.asarray(kp_exp), np.asarray(kp_live), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(conf_exp), np.asarray(conf_live), atol=1e-4
    )

    # precision invariance: bf16 inference stays within a couple px of
    # fp32 on real frames (the reference's reduced-precision deviation
    # check, mixed_precision.rst:170-173 — <0.01 px for fp16 on A100;
    # bf16 has 3 fewer mantissa bits, so the bound here is looser)
    import cv2
    from pathlib import Path

    frame_path = sorted(
        (Path(c.data.data_dir) / "labeled-data").glob("*.png")
    )[0]
    frame = cv2.cvtColor(cv2.imread(str(frame_path)), cv2.COLOR_BGR2RGB)
    m32 = Model.from_dir(tmp_path, precision="fp32")
    kp_bf = m.predict_frame(frame)["keypoints"]
    kp_32 = m32.predict_frame(frame)["keypoints"]
    assert np.abs(kp_bf - kp_32).max() < 3.0  # px at original resolution


@pytest.mark.slow
@pytest.mark.multichip
def test_train_data_parallel_2_devices(cfg, tmp_path):
    """Training over a 2-device mesh produces the same artifact contract
    (the multichip analog of reference test_train.py:167-224)."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs >= 2 devices")
    from lightning_pose_tpu.train import train

    c = _small_train_cfg(cfg, "ddp-test", **{"training.num_gpus": 2})
    train(c, model_dir=tmp_path, skip_evaluation=True)
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    assert ckpt_path_from_base_path(str(tmp_path), "ddp-test") is not None


@pytest.mark.slow
@pytest.mark.multichip
def test_train_mhcrnn_semisup_2_devices(cfg, tmp_path):
    """Context (mhcrnn) semi-supervised training over a 2-device mesh: the
    context-shaped unlabeled batches go through shard_local_batch and the
    doubled sf/mf batch axis must shard cleanly (the sharding-assumption
    hot spots flagged in round 2)."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs >= 2 devices")
    from lightning_pose_tpu.train import train

    c = _small_train_cfg(cfg, "ddp-mhcrnn", **{"training.num_gpus": 2})
    c.model.model_type = "heatmap_mhcrnn"
    c.model.losses_to_use = ["temporal"]
    c.training.train_batch_size = 2
    c.dali.context.train.batch_size = 8
    train(c, model_dir=tmp_path, skip_evaluation=True)
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    assert ckpt_path_from_base_path(str(tmp_path), "ddp-mhcrnn") is not None


@pytest.mark.slow
@pytest.mark.multichip
def test_train_multiview_2_devices(cfg, mv_data_dir, tmp_path):
    """Multiview transformer training over a 2-device mesh: per-view
    (B, V, H, W, 3) reshapes inside the train step must stay consistent
    with the batch-axis sharding."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs >= 2 devices")
    from lightning_pose_tpu.train import train

    c = cfg.copy()
    c.data.data_dir = mv_data_dir
    c.data.video_dir = f"{mv_data_dir}/videos"
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.view_names = ["top", "bot"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = None
    c.data.mirrored_column_matches = [0, 1, 2, 3, 4, 5, 6]
    c.data.columns_for_singleview_pca = None
    c.training.imgaug = "dlc-mv"
    c.training.train_batch_size = 2
    c.training.val_batch_size = 2
    c.training.test_batch_size = 2
    c.training.train_frames = 4
    c.training.max_epochs = 1
    c.training.min_epochs = 1
    c.training.check_val_every_n_epoch = 1
    c.training.unfreezing_epoch = 0
    c.training.num_gpus = 2
    c.model.model_type = "heatmap_multiview"
    c.model.backbone = "vits_dino"
    c.model.model_name = "ddp-mv"
    c.eval.predict_vids_after_training = False
    train(c, model_dir=tmp_path, skip_evaluation=True)
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    assert ckpt_path_from_base_path(str(tmp_path), "ddp-mv") is not None


@pytest.mark.slow
@pytest.mark.parametrize("scan_epochs", [False, True])
def test_train_resume_after_preemption(cfg, tmp_path, scan_epochs):
    """training.resume=true continues a preempted run from the newest
    *-last.ckpt in the SAME version dir, restoring optimizer state — the
    final parameters match an uninterrupted run exactly (batch order is
    epoch-seeded and aug RNG is step-derived, so the trajectory is
    deterministic). The reference has no mid-run resume (PL restarts
    from scratch); this is TPU-VM spot-instance support."""
    import glob

    import jax

    from lightning_pose_tpu.train import train
    from lightning_pose_tpu.train.checkpoints import load_checkpoint

    # uninterrupted 4-epoch run
    c_full = _small_train_cfg(cfg, "resume-test")
    c_full.training.scan_epochs = scan_epochs
    c_full.training.max_epochs = 4
    c_full.training.min_epochs = 4
    dir_a = tmp_path / "a"
    train(c_full, model_dir=dir_a, skip_evaluation=True)

    # "preempted" run: 2 epochs, then resume to 4
    dir_b = tmp_path / "b"
    c_half = _small_train_cfg(cfg, "resume-test")
    c_half.training.scan_epochs = scan_epochs
    c_half.training.max_epochs = 2
    c_half.training.min_epochs = 2
    train(c_half, model_dir=dir_b, skip_evaluation=True)

    vdir_b = dir_b / "tb_logs" / "resume-test" / "version_0"
    lasts = glob.glob(str(vdir_b / "checkpoints" / "*-last.ckpt"))
    assert len(lasts) == 1  # older last ckpts are pruned
    assert "epoch=1" in lasts[0]

    c_resume = _small_train_cfg(cfg, "resume-test")
    c_resume.training.scan_epochs = scan_epochs
    c_resume.training.max_epochs = 4
    c_resume.training.min_epochs = 4
    c_resume.training.resume = True
    train(c_resume, model_dir=dir_b, skip_evaluation=True)

    # continued in the same version dir — no version_1
    assert not (dir_b / "tb_logs" / "resume-test" / "version_1").exists()

    def final_last(d):
        files = glob.glob(
            str(d / "tb_logs" / "resume-test" / "version_0" / "checkpoints"
                / "*-last.ckpt")
        )
        assert len(files) == 1
        return load_checkpoint(files[0])

    ckpt_a, ckpt_b = final_last(dir_a), final_last(dir_b)
    assert ckpt_a["epoch"] == ckpt_b["epoch"] == 3
    assert ckpt_a["step"] == ckpt_b["step"]

    flat_a = jax.tree_util.tree_leaves(ckpt_a["params"])
    flat_b = jax.tree_util.tree_leaves(ckpt_b["params"])
    for la, lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(la, lb, rtol=0, atol=0)


@pytest.mark.slow
def test_train_steps_mode(cfg, tmp_path):
    """Step-based training config (max_steps/unfreezing_step) stops at
    exactly max_steps, with the opt-in epoch-scan loop (partial final
    epoch exercises the short-scan recompile)."""
    from lightning_pose_tpu.train import train

    c = _small_train_cfg(cfg, "steps-test")
    c.training.max_epochs = None
    c.training.min_epochs = None
    c.training.unfreezing_epoch = None
    c.training.max_steps = 3  # steps_per_epoch=2 -> final epoch is partial
    c.training.min_steps = 3
    c.training.unfreezing_step = 0
    c.training.scan_epochs = True
    c.training.lr_scheduler_params.multisteplr.milestones = None
    c.training.lr_scheduler_params.multisteplr.milestone_steps = [2]
    train(c, model_dir=tmp_path, skip_evaluation=True)
    from lightning_pose_tpu.train.checkpoints import load_checkpoint
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    ckpt = ckpt_path_from_base_path(str(tmp_path), "steps-test")
    assert ckpt is not None
    assert int(load_checkpoint(ckpt)["step"]) == 3  # stopped exactly


def test_calculate_steps_per_epoch(cfg, toy_data_dir):
    from lightning_pose_tpu.data.factory import get_data_module, get_dataset
    from lightning_pose_tpu.train import calculate_steps_per_epoch

    dataset = get_dataset(cfg, toy_data_dir)
    dm = get_data_module(cfg, dataset)
    # 90 frames * 0.8 = 72 train; batch 2 -> 36 steps
    assert calculate_steps_per_epoch(dm) == 36


@pytest.mark.slow
@pytest.mark.parametrize("scan_epochs", ["false", "true"])
def test_train_semisupervised(cfg, tmp_path, scan_epochs):
    """Semi-supervised training (temporal loss over unlabeled video) with
    the min-10-steps floor — per-step AND the scanned-epoch program with
    epoch-prefetched unlabeled windows (the TPU default)."""
    from lightning_pose_tpu.train import train

    c = _small_train_cfg(cfg, "semisup-test")
    c.model.losses_to_use = ["temporal"]
    c.dali.base.train.sequence_length = 4
    c.training.scan_epochs = scan_epochs
    train(c, model_dir=tmp_path, skip_evaluation=True)
    # anneal weight + temporal loss must appear in the TB logs dir
    import glob

    assert glob.glob(str(tmp_path / "tb_logs" / "semisup-test" / "version_*"))


@pytest.mark.slow
def test_train_multiview(cfg, mv_data_dir, tmp_path):
    """Multiview transformer end-to-end on the synthesized 2-view split."""
    from lightning_pose_tpu.train import train

    c = cfg.copy()
    c.data.data_dir = mv_data_dir
    c.data.video_dir = f"{mv_data_dir}/videos"
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.view_names = ["top", "bot"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = None
    c.data.mirrored_column_matches = [0, 1, 2, 3, 4, 5, 6]
    c.data.columns_for_singleview_pca = None
    c.training.imgaug = "dlc-mv"
    c.training.train_batch_size = 2
    c.training.val_batch_size = 2
    c.training.test_batch_size = 2
    c.training.train_frames = 4
    c.training.max_epochs = 1
    c.training.min_epochs = 1
    c.training.check_val_every_n_epoch = 1
    c.training.unfreezing_epoch = 0
    c.model.model_type = "heatmap_multiview"
    c.model.backbone = "vits_dino"
    c.model.model_name = "mv-test"
    # the reference's patch-mask curriculum schema (training.patch_mask)
    c.training.patch_mask = {
        "init_epoch": 0, "final_epoch": 1,
        "init_ratio": 0.2, "final_ratio": 0.5,
    }
    c.eval.predict_vids_after_training = False
    train(c, model_dir=tmp_path)
    assert (tmp_path / "image_preds" / "top.csv" / "predictions.csv").exists()
    assert (tmp_path / "image_preds" / "bot.csv" / "predictions.csv").exists()
    assert (tmp_path / "predictions_top.csv").exists()

    # reload through the Model API and run the multiview CSV path
    from lightning_pose_tpu.api.model import Model

    m = Model.from_dir(tmp_path)
    out = m.predict_on_label_csv_multiview(
        csv_file_per_view=["top.csv", "bot.csv"], compute_metrics=False
    )
    assert set(out.predictions.keys()) == {"top", "bot"}
    assert out.predictions["top"].shape[0] == 90
    assert set(out.to_dict().keys()) == {"top", "bot"}

    # predict_frame on a multiview model takes one frame per view
    result = m.predict_frame(np.zeros((2, 168, 396, 3), dtype=np.uint8))
    assert result["keypoints"].shape == (14, 2)  # view-major 2 views x 7 kps
    with pytest.raises(ValueError, match="Multiview model requires"):
        m.predict_frame(np.zeros((168, 396, 3), dtype=np.uint8))


@pytest.mark.slow
def test_train_heatmap_multiview(cfg, mv_data_dir, tmp_path):
    """Plain heatmap tracker on multiview data (the reference's standard
    separate-views workflow, e.g. mirror-mouse-separate): views fold into
    the model batch, per-view artifacts, semi-supervised pca_multiview over
    the synchronized unlabeled stream (reference data/factory.py:152-185
    dispatches any heatmap* model with view_names to the multiview
    dataset)."""
    from lightning_pose_tpu.train import train

    c = cfg.copy()
    c.data.data_dir = mv_data_dir
    c.data.video_dir = f"{mv_data_dir}/videos"
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.view_names = ["top", "bot"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = None
    c.data.mirrored_column_matches = [0, 1, 2, 3, 4, 5, 6]
    c.data.columns_for_singleview_pca = None
    c.training.imgaug = "dlc-mv"
    c.training.train_batch_size = 2
    c.training.val_batch_size = 2
    c.training.test_batch_size = 2
    c.training.train_frames = 4
    c.training.max_epochs = 1
    c.training.min_epochs = 1
    c.training.check_val_every_n_epoch = 1
    c.training.unfreezing_epoch = 0
    c.dali.base.train.sequence_length = 8
    c.model.model_type = "heatmap"
    c.model.backbone = "resnet18"
    c.model.losses_to_use = ["pca_multiview"]
    c.model.model_name = "mv-heatmap-test"
    c.eval.predict_vids_after_training = False
    train(c, model_dir=tmp_path)

    assert (tmp_path / "image_preds" / "top.csv" / "predictions.csv").exists()
    assert (tmp_path / "image_preds" / "bot.csv" / "predictions.csv").exists()
    assert (tmp_path / "predictions_top.csv").exists()

    from lightning_pose_tpu.api.model import Model

    m = Model.from_dir(tmp_path)
    # one frame per view
    result = m.predict_frame(np.zeros((2, 168, 396, 3), dtype=np.uint8))
    assert result["keypoints"].shape == (14, 2)  # view-major 2 views x 7 kps
    assert np.isfinite(result["keypoints"]).all()

    out = m.predict_on_label_csv_multiview(
        csv_file_per_view=["top.csv", "bot.csv"], compute_metrics=False
    )
    assert set(out.predictions.keys()) == {"top", "bot"}
    assert out.predictions["top"].shape[0] == 90

    res = m.predict_on_video_file_multiview(
        [
            f"{mv_data_dir}/videos/test_vid_top.mp4",
            f"{mv_data_dir}/videos/test_vid_bot.mp4",
        ],
        compute_metrics=False,
    )
    n_frames = len(res.predictions["top"])
    assert n_frames == len(res.predictions["bot"]) > 0
    for view in ("top", "bot"):
        arr = res.predictions[view].to_numpy(dtype=float)
        assert np.isfinite(arr).all()


@pytest.mark.slow
def test_train_mhcrnn_multiview(cfg, mv_data_dir, tmp_path):
    """heatmap_mhcrnn on multiview data: context stacks per view fused to
    (B, V, 5, H, W, 3), views folded into the CRNN batch, semi-supervised
    with pca_multiview over the synchronized unlabeled multiview stream
    (reference tests/models/test_heatmap_tracker_mhcrnn.py:53-66,125-144)."""
    from lightning_pose_tpu.train import train

    c = cfg.copy()
    c.data.data_dir = mv_data_dir
    c.data.video_dir = f"{mv_data_dir}/videos"
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.data.view_names = ["top", "bot"]
    c.data.num_keypoints = 7
    c.data.keypoint_names = None
    c.data.mirrored_column_matches = [0, 1, 2, 3, 4, 5, 6]
    c.data.columns_for_singleview_pca = None
    c.training.imgaug = "dlc-mv"
    c.training.train_batch_size = 2
    c.training.val_batch_size = 2
    c.training.test_batch_size = 2
    c.training.train_frames = 4
    c.training.max_epochs = 1
    c.training.min_epochs = 1
    c.training.check_val_every_n_epoch = 1
    c.training.unfreezing_epoch = 0
    c.dali.base.train.sequence_length = 8
    c.model.model_type = "heatmap_mhcrnn"
    c.model.backbone = "resnet18"
    c.model.losses_to_use = ["pca_multiview"]
    c.model.model_name = "mv-mhcrnn-test"
    c.eval.predict_vids_after_training = False
    train(c, model_dir=tmp_path)

    # evaluation artifacts: per-view predictions from context batches
    assert (tmp_path / "image_preds" / "top.csv" / "predictions.csv").exists()
    assert (tmp_path / "predictions_top.csv").exists()

    # Model API reload: multiview context predict_frame takes one 5-frame
    # stack per view
    from lightning_pose_tpu.api.model import Model

    m = Model.from_dir(tmp_path)
    result = m.predict_frame(np.zeros((2, 5, 168, 396, 3), dtype=np.uint8))
    assert result["keypoints"].shape == (14, 2)  # view-major 2 views x 7 kps
    assert np.isfinite(result["keypoints"]).all()
    with pytest.raises(ValueError, match="Multiview context"):
        m.predict_frame(np.zeros((5, 168, 396, 3), dtype=np.uint8))

    # label-CSV prediction runs the context multiview batch path
    out = m.predict_on_label_csv_multiview(
        csv_file_per_view=["top.csv", "bot.csv"], compute_metrics=False
    )
    assert set(out.predictions.keys()) == {"top", "bot"}
    assert out.predictions["top"].shape[0] == 90

    # multiview video inference with context windows + shift-by-2
    res = m.predict_on_video_file_multiview(
        [
            f"{mv_data_dir}/videos/test_vid_top.mp4",
            f"{mv_data_dir}/videos/test_vid_bot.mp4",
        ],
        compute_metrics=False,
    )
    n_frames = len(res.predictions["top"])
    assert n_frames == len(res.predictions["bot"]) > 0
    for view in ("top", "bot"):
        arr = res.predictions[view].to_numpy(dtype=float)
        assert np.isfinite(arr).all()


@pytest.mark.slow
def test_scanned_semisup_epoch_matches_per_step(cfg):
    """The scanned semi-supervised epoch (epoch-prefetched unlabeled
    windows stacked along the scan axis) must produce the same parameter
    trajectory as stepping train_step_cached with the same windows."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.losses.factory import LossFactory
    from lightning_pose_tpu.models.heatmap_tracker import HeatmapTracker
    from lightning_pose_tpu.ops.augment import AugmentationEngine
    from lightning_pose_tpu.train.trainer import (
        TrainState,
        make_optimizer,
        make_step_fns,
    )

    size, bs, n_cache, n_steps, n_kp, seq = 64, 2, 6, 3, 3, 4
    c = cfg.copy()
    c.data.image_resize_dims.height = size
    c.data.image_resize_dims.width = size
    c.data.num_keypoints = n_kp
    c.training.train_batch_size = bs
    c.training.imgaug = "default"
    c.callbacks.anneal_weight.init_val = 0.5
    c.callbacks.anneal_weight.freeze_until_epoch = 0

    model = HeatmapTracker(
        backbone_arch="resnet18", num_keypoints=n_kp, image_size=size,
        dtype=jnp.float32,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((bs, size, size, 3)), train=False
    )
    tx, _, _ = make_optimizer(c, n_steps, variables["params"])

    def fresh_state():
        return TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=jax.tree_util.tree_map(jnp.copy, variables["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.copy, variables.get("batch_stats", {})
            ),
            opt_state=tx.init(variables["params"]),
        )

    lf = {
        "supervised": LossFactory({"heatmap_mse": {"log_weight": 0.0}}),
        "unsupervised": LossFactory(
            {"temporal": {"log_weight": 0.0, "epsilon": 0.0}}
        ),
    }
    meta = {
        "model_type": "heatmap", "semi_supervised": True,
        "downsample_factor": 2, "num_keypoints": n_kp, "image_size": size,
    }
    aug = AugmentationEngine("default", size, size)
    *_, train_step_cached, train_epoch_cached = make_step_fns(
        model, meta, lf, aug, c, tx, n_steps
    )

    np_rng = np.random.default_rng(0)
    cache = {
        "images": jnp.asarray(
            np_rng.integers(0, 255, (n_cache, size, size, 3)), jnp.uint8
        ),
        "keypoints": jnp.asarray(
            np_rng.uniform(5, size - 5, (n_cache, n_kp, 2)), jnp.float32
        ),
        "visibility": jnp.full((n_cache, n_kp), 2, jnp.int64),
        "bbox": jnp.tile(
            jnp.asarray([0.0, 0.0, size, size], jnp.float32), (n_cache, 1)
        ),
    }
    idxs_all = np_rng.integers(0, n_cache, (n_steps, bs)).astype(np.int32)
    valid_all = np.ones((n_steps, bs), bool)
    windows = [
        {
            "frames": np_rng.integers(0, 255, (seq, size, size, 3)).astype(
                np.uint8
            ),
            "bbox": np.tile(
                np.asarray([0.0, 0.0, size, size], np.float32), (seq, 1)
            ),
        }
        for _ in range(n_steps)
    ]
    rng_key = jax.random.PRNGKey(5)

    # per-step path
    s = fresh_state()
    for i in range(n_steps):
        ul = {k: jnp.asarray(v) for k, v in windows[i].items()}
        s, logs = train_step_cached(
            s, cache, jnp.asarray(idxs_all[i]), jnp.asarray(valid_all[i]),
            rng_key, ul,
        )
        assert float(logs["train_unsupervised_loss"]) > 0.0
    p_step = np.asarray(s.params["head"]["deconv0"]["kernel"])

    # scanned path with the SAME windows stacked
    unlabeled_all = {
        k: jnp.asarray(np.stack([w[k] for w in windows])) for k in windows[0]
    }
    s2, logs_stack = train_epoch_cached(
        fresh_state(), cache, jnp.asarray(idxs_all), jnp.asarray(valid_all),
        rng_key, unlabeled_all,
    )
    assert np.asarray(logs_stack["train_unsupervised_loss"]).shape == (n_steps,)
    p_scan = np.asarray(s2.params["head"]["deconv0"]["kernel"])
    # scan-body vs standalone-jit compilations reassociate float reductions
    # differently; observed max |diff| ~5e-6 after 3 Adam steps
    np.testing.assert_allclose(p_scan, p_step, atol=2e-5)


@pytest.mark.slow
def test_cached_and_uncached_steps_equivalent(cfg, toy_data_dir):
    """The device-cache path must produce the same update as the host-batch
    path for the same samples and rng."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.data.datamodules import collate_batch
    from lightning_pose_tpu.data.factory import get_data_module, get_dataset
    from lightning_pose_tpu.losses.factory import get_loss_factories
    from lightning_pose_tpu.models.factory import get_model
    from lightning_pose_tpu.ops.augment import AugmentationEngine
    from lightning_pose_tpu.train.trainer import (
        TrainState,
        make_optimizer,
        make_step_fns,
    )

    c = cfg.copy()
    c.training.imgaug = "default"
    c.training.train_batch_size = 4
    dataset = get_dataset(c, toy_data_dir)
    dm = get_data_module(c, dataset)
    module, meta = get_model(c, num_keypoints=dataset.num_keypoints,
                             compute_dtype=jnp.float32)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
    )
    tx, _, _ = make_optimizer(c, 10, variables["params"])
    state0 = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    lf = get_loss_factories(c, dm)
    aug = AugmentationEngine("default", 128, 128)
    train_step, _, _, train_step_cached, _ = make_step_fns(
        module, meta, lf, aug, c, tx, 10
    )

    # donation deletes the first state's buffers; keep independent copies
    params_copy = jax.tree_util.tree_map(jnp.copy, variables["params"])
    stats_copy = jax.tree_util.tree_map(
        jnp.copy, variables.get("batch_stats", {})
    )

    idxs = np.asarray(dm.train_dataset.indices[:4], dtype=np.int32)
    batch = collate_batch(dataset, idxs, 4)
    rng_key = jax.random.PRNGKey(7)
    s1, logs1 = train_step(state0, batch, rng_key)

    cache = {
        k: jnp.asarray(np.stack([np.asarray(dataset[i][k]) for i in range(len(dataset))]))
        for k in ("images", "keypoints", "visibility", "bbox")
    }
    state0b = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params_copy,
        batch_stats=stats_copy,
        opt_state=tx.init(params_copy),
    )
    s2, logs2 = train_step_cached(
        state0b, cache, jnp.asarray(idxs), jnp.ones(4, bool), rng_key, {}
    )
    assert float(logs1["total_loss"]) == pytest.approx(
        float(logs2["total_loss"]), rel=1e-5
    )
    p1 = np.asarray(s1.params["head"]["deconv0"]["kernel"])
    p2 = np.asarray(s2.params["head"]["deconv0"]["kernel"])
    np.testing.assert_allclose(p1, p2, atol=1e-6)


@pytest.mark.slow
def test_train_mhcrnn(cfg, tmp_path):
    """heatmap_mhcrnn end-to-end through train(): supervised context model
    with a temporal unlabeled loss (BASELINE config #3; reference exercises
    every model type via run_model_test, conftest.py:610-651)."""
    from lightning_pose_tpu.train import train

    c = _small_train_cfg(cfg, "mhcrnn-test")
    c.model.model_type = "heatmap_mhcrnn"
    c.model.losses_to_use = ["temporal"]
    c.training.train_batch_size = 2
    c.dali.context.train.batch_size = 8
    model = train(c, model_dir=tmp_path)

    assert (tmp_path / "predictions.csv").exists()
    assert (tmp_path / "predictions_pixel_error.csv").exists()
    import json

    status = json.loads((tmp_path / "train_status.json").read_text())
    assert status["status"] == "COMPLETED"

    import pandas as pd

    df = pd.read_csv(tmp_path / "predictions.csv", header=[0, 1, 2], index_col=0)
    assert df.shape[0] == 90
    numeric = df.loc[:, df.columns.get_level_values(0) != "set"]
    assert np.isfinite(numeric.to_numpy(dtype=float)).all()

    # the Model API reloads the context model; predict_frame takes a
    # (T, H, W, 3) context stack and rejects single frames (reference
    # model.py:830-836)
    from lightning_pose_tpu.api.model import Model

    m = Model.from_dir(tmp_path)
    result = m.predict_frame(np.zeros((5, 406, 396, 3), dtype=np.uint8))
    assert result["keypoints"].shape == (17, 2)
    assert result["confidence"].shape == (17,)
    with pytest.raises(ValueError, match="Context model requires"):
        m.predict_frame(np.zeros((406, 396, 3), dtype=np.uint8))


def test_train_mhcrnn_repeat_center_context(cfg, tmp_path):
    """model.mhcrnn_context_mode=repeat_center end-to-end: trains, saves
    the knob in config.yaml, and the eval dataset rebuilt from the saved
    config stacks 5 copies of the center frame (the product knob for
    sparse-labeled datasets; see docs/architecture.md mhcrnn root-cause)."""
    from lightning_pose_tpu.train import train

    c = _small_train_cfg(cfg, "mhcrnn-repeat-test")
    c.model.model_type = "heatmap_mhcrnn"
    c.model.mhcrnn_context_mode = "repeat_center"
    c.training.train_batch_size = 2
    train(c, model_dir=tmp_path, skip_evaluation=True)

    from lightning_pose_tpu.config import load_config
    from lightning_pose_tpu.data.factory import get_dataset

    saved = load_config(str(tmp_path / "config.yaml"))
    assert saved.model.mhcrnn_context_mode == "repeat_center"
    ds = get_dataset(saved, str(saved.data.data_dir))
    stack = ds[3]["images"]
    assert stack.shape[0] == 5
    for t in range(5):
        np.testing.assert_array_equal(stack[t], stack[2])

    # video inference consistency: sliding windows must also feed repeated
    # centers (a repeat-trained MF head degrades on real temporal context:
    # 21.4 vs 4.25 px test measured on mirror-mouse) — predictions depend
    # ONLY on window centers, so scrambling pure-edge frames is a no-op
    from lightning_pose_tpu.api.model import Model

    m = Model.from_dir(tmp_path)
    m._load()
    h = int(saved.data.image_resize_dims.height)
    w = int(saved.data.image_resize_dims.width)
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 255, (8, h, w, 3), np.uint8)
    bbox = np.tile(np.array([0, 0, 406, 396], np.float32), (8, 1))
    kp1, _ = m._predict_fn(m._state, seq, bbox)
    seq2 = seq.copy()
    seq2[0] = seq2[7] = rng.integers(0, 255, (h, w, 3), np.uint8)
    kp2, _ = m._predict_fn(m._state, seq2, bbox)
    np.testing.assert_allclose(np.asarray(kp1), np.asarray(kp2))


@pytest.mark.slow
def test_train_semisupervised_pca_singleview_temporal(cfg, tmp_path):
    """Semi-supervised heatmap with the BASELINE loss combo
    ['pca_singleview', 'temporal'] through train()."""
    from lightning_pose_tpu.train import train

    c = _small_train_cfg(cfg, "semisup-pca-test")
    c.model.losses_to_use = ["pca_singleview", "temporal"]
    c.training.train_frames = 40  # PCA needs more samples than columns
    c.dali.base.train.sequence_length = 4
    train(c, model_dir=tmp_path)
    assert (tmp_path / "predictions.csv").exists()
    # the pca_singleview metric side-CSV must be produced
    assert (tmp_path / "predictions_pca_singleview_error.csv").exists()


@pytest.fixture()
def writable_data_dir(toy_data_dir, tmp_path):
    """Copy of the example dataset in a writable tmp dir (symlinked images)
    so tests can add OOD label files next to the training CSV."""
    import shutil

    d = tmp_path / "data"
    d.mkdir()
    os.symlink(
        os.path.join(toy_data_dir, "labeled-data"), d / "labeled-data"
    )
    os.symlink(os.path.join(toy_data_dir, "videos"), d / "videos")
    shutil.copy(os.path.join(toy_data_dir, "CollectedData.csv"), d)
    return d


@pytest.mark.slow
def test_train_evaluates_suffixed_label_files(cfg, writable_data_dir, tmp_path):
    """'<stem>_new.csv' label files get predicted after training with no
    'set' column (reference train.py:110-113,146-246)."""
    import pandas as pd

    from lightning_pose_tpu.train import train

    df = pd.read_csv(
        writable_data_dir / "CollectedData.csv", header=[0, 1, 2], index_col=0
    )
    df.iloc[:10].to_csv(writable_data_dir / "CollectedData_new.csv")

    c = _small_train_cfg(cfg, "ood-test")
    c.data.data_dir = str(writable_data_dir)
    c.data.video_dir = str(writable_data_dir / "videos")
    model_dir = tmp_path / "model"
    train(c, model_dir=model_dir)

    ood_preds = model_dir / "image_preds" / "CollectedData_new.csv" / "predictions.csv"
    assert ood_preds.exists()
    ood = pd.read_csv(ood_preds, header=[0, 1, 2], index_col=0)
    assert ood.shape[0] == 10
    # legacy copies with suffix in the model dir, incl. the pixel-error CSV
    assert (model_dir / "predictions_new.csv").exists()
    assert (model_dir / "predictions_pixel_error_new.csv").exists()


def test_split_sizes_from_probabilities():
    """Reference split semantics (reference data/utils.py:17-73)."""
    from lightning_pose_tpu.data.datamodules import split_sizes_from_probabilities

    # only train_prob: remainder split 50/50 between val and test
    assert split_sizes_from_probabilities(100, 0.8) == (80, 10, 10)
    # <5 leftover goes to train, not test
    assert split_sizes_from_probabilities(10, 0.7) == (9, 1, 0)
    assert split_sizes_from_probabilities(100, 0.95) == (98, 2, 0)
    # explicit val prob
    assert split_sizes_from_probabilities(100, 0.8, 0.1) == (80, 10, 10)
    # at least one validation sample
    assert split_sizes_from_probabilities(2, 0.5)[1] >= 1


def test_milestone_steps_round_up(cfg):
    """Step-mode LR milestones convert to epochs with ceil (reference
    train.py:325-332): milestone_steps=[150] at 100 steps/epoch fires at
    epoch 2 (step 200), not epoch 1."""
    import jax.numpy as jnp

    from lightning_pose_tpu.train.trainer import make_optimizer

    c = cfg.copy()
    c.training.max_epochs = None
    c.training.min_epochs = None
    c.training.unfreezing_epoch = None
    c.training.unfreezing_step = 0
    c.training.max_steps = 400
    c.training.lr_scheduler_params.multisteplr.milestones = None
    c.training.lr_scheduler_params.multisteplr.milestone_steps = [150]
    params = {"head": {"w": jnp.zeros(1)}}
    _, head_sched, _ = make_optimizer(c, steps_per_epoch=100, params=params)
    base = float(c.training.optimizer_params.learning_rate)
    assert float(head_sched(150)) == pytest.approx(base)  # not yet dropped
    assert float(head_sched(200)) == pytest.approx(base * 0.5)


def test_run_validation_epoch_sample_weighted():
    """A partial final val batch must not skew the epoch metric: per-batch
    means are weighted by real-sample counts (the sample mean, not the
    batch mean-of-means)."""
    from lightning_pose_tpu.train.trainer import run_validation_epoch

    # batch 1: 4 real samples, per-sample loss 1.0; batch 2: 1 real sample
    # (3 pad rows), per-sample loss 6.0. Sample mean = (4*1 + 1*6)/5 = 2.0;
    # a naive mean-of-batch-means would give (1+6)/2 = 3.5.
    batches = [
        {"valid": np.array([True] * 4), "x": np.zeros(4)},
        {"valid": np.array([True, False, False, False]), "x": np.zeros(4)},
    ]
    losses = iter([{"val_supervised_loss": 1.0}, {"val_supervised_loss": 6.0}])
    logs = run_validation_epoch(batches, lambda b: next(losses))
    assert logs["val_supervised_loss"] == pytest.approx(2.0)

    # no 'valid' mask -> weight by batch length
    batches = [{"x": np.zeros(2)}, {"x": np.zeros(1)}]
    losses = iter([{"m": 3.0}, {"m": 9.0}])
    logs = run_validation_epoch(batches, lambda b: next(losses))
    assert logs["m"] == pytest.approx((2 * 3.0 + 1 * 9.0) / 3)


def test_eval_batches_nan_padded_labels(cfg, toy_data_dir):
    """Padded eval rows carry NaN labels so pixel-RMSE ignores them."""
    from lightning_pose_tpu.data.datamodules import collate_batch
    from lightning_pose_tpu.data.factory import get_dataset

    dataset = get_dataset(cfg, toy_data_dir, imgaug_pipeline="default")
    batch = collate_batch(dataset, np.asarray([0, 1, 2]), batch_size=8)
    assert batch["valid"].tolist() == [True] * 3 + [False] * 5
    assert np.isnan(batch["keypoints"][3:]).all()
    assert (batch["visibility"][3:] == 0).all()


@pytest.mark.slow
def test_train_non_square_resize_dims(cfg, tmp_path):
    """Rectangular image_resize_dims (128x256) end-to-end: dlc aug warp,
    heatmap targets, decode, and frame-coordinate remap all handle H != W
    (the reference supports rectangular dims everywhere)."""
    import pandas as pd

    from lightning_pose_tpu.train import train

    c = _small_train_cfg(cfg, "rect-test")
    c.data.image_resize_dims.height = 128
    c.data.image_resize_dims.width = 256
    c.training.imgaug = "dlc"
    train(c, model_dir=tmp_path)
    df = pd.read_csv(tmp_path / "predictions.csv", header=[0, 1, 2], index_col=0)
    assert df.shape[0] == 90
    numeric = df.loc[:, df.columns.get_level_values(0) != "set"]
    assert np.isfinite(numeric.to_numpy(dtype=float)).all()


def test_vit_forward_non_square(rng):
    """ViT-family backbones accept rectangular inputs (pos embeddings are
    bicubic-resized in-graph to the (gh, gw) grid)."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.models.heatmap_tracker import HeatmapTracker

    model = HeatmapTracker(
        backbone_arch="vits_dino", num_keypoints=3, image_size=128,
        dtype=jnp.float32,
    )
    x = jnp.asarray(rng.standard_normal((1, 128, 256, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    hm = model.apply(variables, x, train=False)
    assert hm.shape == (1, 32, 64, 3)  # H/4, W/4
    kp, conf = model.decode(hm)
    kp = np.asarray(kp).reshape(1, 3, 2)
    assert np.isfinite(kp).all()
    assert kp[..., 0].max() <= 256 and kp[..., 1].max() <= 128


@pytest.mark.slow
def test_train_hflip_left_right_pairs(cfg, toy_data_dir, tmp_path):
    """Horizontal-flip augmentation end-to-end on a dataset with real
    _left/_right keypoint pairs (training.imgaug_hflip, reference
    datasets.py:175-232): train() runs, swap indices are built from the
    CSV names, and artifacts are finite."""
    import os

    import pandas as pd

    # re-label mirror-mouse's 17 keypoints as 8 left/right pairs + 1 neutral
    pair_names = []
    for i in range(8):
        pair_names += [f"kp{i}_left", f"kp{i}_right"]
    names = pair_names + ["center"]

    df = pd.read_csv(
        os.path.join(toy_data_dir, "CollectedData.csv"),
        header=[0, 1, 2], index_col=0,
    )
    df.columns = pd.MultiIndex.from_tuples(
        [(sc, names[i // 2], co) for i, (sc, _, co) in enumerate(df.columns)],
        names=df.columns.names,
    )
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    df.to_csv(data_dir / "CollectedData.csv")
    os.symlink(
        os.path.join(toy_data_dir, "labeled-data"), data_dir / "labeled-data"
    )
    os.symlink(os.path.join(toy_data_dir, "videos"), data_dir / "videos")

    from lightning_pose_tpu.data.factory import get_dataset
    from lightning_pose_tpu.train import train

    c = _small_train_cfg(cfg, "hflip-test")
    c.data.data_dir = str(data_dir)
    c.data.video_dir = str(data_dir / "videos")
    c.data.keypoint_names = names
    c.training.imgaug_hflip = True
    c.eval.predict_vids_after_training = False

    # the dataset wires the left/right swap permutation from the CSV names
    ds = get_dataset(c, data_dir=str(data_dir))
    swap = ds.hflip_swap_indices
    assert list(swap[:4]) == [1, 0, 3, 2]  # pairs swapped
    assert swap[16] == 16  # neutral keypoint fixed

    model_dir = tmp_path / "model"
    train(c, model_dir=model_dir)
    assert (model_dir / "predictions.csv").exists()
    preds = pd.read_csv(
        model_dir / "predictions.csv", header=[0, 1, 2], index_col=0
    )
    numeric = preds.loc[:, preds.columns.get_level_values(0) != "set"]
    assert np.isfinite(numeric.to_numpy(dtype=float)).all()

    # unpaired _left keypoints in the label CSV are rejected up front
    bad_names = ["kp0_left", "kp0b"] + names[2:]  # kp0_right renamed away
    bad_df = df.copy()
    bad_df.columns = pd.MultiIndex.from_tuples(
        [(sc, bad_names[i // 2], co)
         for i, (sc, _, co) in enumerate(df.columns)],
        names=df.columns.names,
    )
    bad_dir = tmp_path / "bad_data"
    bad_dir.mkdir()
    bad_df.to_csv(bad_dir / "CollectedData.csv")
    os.symlink(
        os.path.join(toy_data_dir, "labeled-data"), bad_dir / "labeled-data"
    )
    c_bad = c.copy()
    c_bad.data.data_dir = str(bad_dir)
    c_bad.data.keypoint_names = bad_names
    with pytest.raises(ValueError, match="no _right partner"):
        get_dataset(c_bad, data_dir=str(bad_dir))


@pytest.mark.slow
def test_epoch_scan_matches_per_step(cfg, toy_data_dir):
    """The lax.scan epoch program must produce exactly the same parameter
    trajectory as stepping the cached train step one batch at a time."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.data.factory import get_data_module, get_dataset
    from lightning_pose_tpu.losses.factory import get_loss_factories
    from lightning_pose_tpu.models.factory import get_model
    from lightning_pose_tpu.ops.augment import AugmentationEngine
    from lightning_pose_tpu.train.trainer import (
        TrainState,
        make_optimizer,
        make_step_fns,
    )

    c = cfg.copy()
    c.training.imgaug = "default"
    c.training.train_batch_size = 4
    dataset = get_dataset(c, toy_data_dir)
    dm = get_data_module(c, dataset)
    module, meta = get_model(c, num_keypoints=dataset.num_keypoints,
                             compute_dtype=jnp.float32)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
    )
    tx, _, _ = make_optimizer(c, 10, variables["params"])
    lf = get_loss_factories(c, dm)
    aug = AugmentationEngine("default", 128, 128)
    _, _, _, step_fn, epoch_fn = make_step_fns(module, meta, lf, aug, c, tx, 10)

    cache = {
        k: jnp.asarray(
            np.stack([np.asarray(dataset[i][k]) for i in range(len(dataset))])
        )
        for k in ("images", "keypoints", "visibility", "bbox")
    }
    rng_key = jax.random.PRNGKey(11)
    n_steps = 3
    idxs_all = np.stack(
        [np.asarray(dm.train_dataset.indices[i * 4:(i + 1) * 4], np.int32)
         for i in range(n_steps)]
    )
    valid_all = np.ones((n_steps, 4), bool)

    def fresh_state(params, stats):
        return TrainState(
            step=jnp.asarray(0, jnp.int32), params=params,
            batch_stats=stats, opt_state=tx.init(params),
        )

    pa = jax.tree_util.tree_map(jnp.copy, variables["params"])
    sa = jax.tree_util.tree_map(jnp.copy, variables.get("batch_stats", {}))
    state = fresh_state(pa, sa)
    per_step_losses = []
    for i in range(n_steps):
        state, logs = step_fn(
            state, cache, jnp.asarray(idxs_all[i]),
            jnp.asarray(valid_all[i]), rng_key, {},
        )
        per_step_losses.append(float(logs["total_loss"]))
    p_seq = np.asarray(state.params["head"]["deconv0"]["kernel"])

    pb = jax.tree_util.tree_map(jnp.copy, variables["params"])
    sb = jax.tree_util.tree_map(jnp.copy, variables.get("batch_stats", {}))
    state2, logs_stack = epoch_fn(
        fresh_state(pb, sb), cache, jnp.asarray(idxs_all),
        jnp.asarray(valid_all), rng_key, {},
    )
    p_scan = np.asarray(state2.params["head"]["deconv0"]["kernel"])
    scan_losses = [float(v) for v in np.asarray(logs_stack["total_loss"])]

    np.testing.assert_allclose(scan_losses, per_step_losses, rtol=1e-5)
    np.testing.assert_allclose(p_scan, p_seq, atol=1e-6)
    assert int(state2.step) == n_steps


@pytest.mark.slow
def test_train_regression(cfg, tmp_path):
    """Regression tracker end-to-end through train(): supervised direct
    coordinate regression (reference run_model_test covers every model
    type, tests/models/test_regression_tracker.py)."""
    from lightning_pose_tpu.train import train

    c = cfg.copy()
    c.model.model_type = "regression"
    c.model.model_name = "regression-test"
    c.training.max_epochs = 1
    c.training.min_epochs = 1
    c.eval.predict_vids_after_training = False
    model = train(c, model_dir=tmp_path)

    assert (tmp_path / "predictions.csv").exists()
    assert (tmp_path / "config.yaml").exists()
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    ckpt = ckpt_path_from_base_path(str(tmp_path), "regression-test")
    assert ckpt is not None

    # regression predictions carry unit likelihoods (no heatmap confidence)
    import pandas as pd

    preds = pd.read_csv(tmp_path / "predictions.csv", header=[0, 1, 2],
                        index_col=0)
    lik = preds.loc[
        :, preds.columns.get_level_values("coords") == "likelihood"
    ].to_numpy()
    assert np.allclose(lik.astype(float), 1.0)

    # the Model API round-trips the trained regression model
    from lightning_pose_tpu.api.model import Model

    m = Model.from_dir(tmp_path)
    out = m.predict_frame(np.zeros((406, 396, 3), dtype=np.uint8))
    assert out["keypoints"].shape == (17, 2)


@pytest.mark.slow
def test_train_semisupervised_regression(cfg, tmp_path):
    """Semi-supervised regression (temporal loss on the unlabeled stream,
    no heatmap decode; reference regression_tracker.py:123-213)."""
    from lightning_pose_tpu.train import train

    c = cfg.copy()
    c.model.model_type = "regression"
    c.model.model_name = "semisup-regression-test"
    c.model.losses_to_use = ["temporal"]
    c.training.max_epochs = 1
    c.training.min_epochs = 1
    c.eval.predict_vids_after_training = False
    train(c, model_dir=tmp_path, skip_evaluation=True)

    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    assert ckpt_path_from_base_path(
        str(tmp_path), "semisup-regression-test"
    ) is not None
