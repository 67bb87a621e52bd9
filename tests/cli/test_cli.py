"""CLI tests: parser registration, cropzoom commands, e2e train+predict."""

import numpy as np
import pandas as pd
import pytest

from lightning_pose_tpu.cli.main import build_parser, main


def test_all_commands_registered(tmp_path):
    # path-type args are validated at parse time (cli/types.py), so the
    # minimal args must exist on disk
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text("a: 1")
    parser = build_parser()
    for cmd in [
        "train", "predict", "export", "create_bbox", "smooth_bbox",
        "crop", "remap", "run_app",
    ]:
        args = parser.parse_args([cmd, *_minimal_args(cmd, tmp_path)])
        assert args.command == cmd


def test_version_flag_exits_zero(capsys):
    """--version prints the package version and exits 0
    (reference tests/cli/test_main.py:43-55)."""
    import lightning_pose_tpu

    with pytest.raises(SystemExit) as exc:
        build_parser().parse_args(["--version"])
    assert exc.value.code == 0
    assert lightning_pose_tpu.__version__ in capsys.readouterr().out


def _minimal_args(cmd: str, tmp_path) -> list[str]:
    d = str(tmp_path)
    return {
        "train": [f"{d}/cfg.yaml"],
        "predict": [d, "video.mp4"],
        "export": [d],
        "create_bbox": [d, "video.mp4"],
        "smooth_bbox": ["in_dir", "--output_dir", "out_dir"],
        "crop": [d, "video.mp4"],
        "remap": ["preds.csv", "bbox.csv"],
        "run_app": [],
    }[cmd]


def _fake_model_dir(tmp_path, data_dir=None):
    """Minimal model dir for the cropzoom CLI (config.yaml only — the
    cropzoom commands use dir conventions, not the checkpoint)."""
    model_dir = tmp_path / "detector_model"
    model_dir.mkdir(exist_ok=True)
    (model_dir / "config.yaml").write_text(
        f"""
data:
  data_dir: {data_dir or tmp_path}
model:
  model_name: detector
  model_type: heatmap
"""
    )
    return model_dir


def _write_preds_csv(path, n=20, keypoints=("a", "b")):
    cols = pd.MultiIndex.from_product(
        [["t"], list(keypoints), ["x", "y", "likelihood"]],
        names=["scorer", "bodyparts", "coords"],
    )
    rng = np.random.default_rng(0)
    arr = rng.uniform(50, 150, size=(n, len(keypoints) * 3))
    pd.DataFrame(arr, columns=cols).to_csv(path)


def test_create_smooth_remap_roundtrip(tmp_path):
    """Model-dir-centric cropzoom flow (reference create_bbox.py:160-176
    output conventions): video predictions at video_preds/<stem>.csv ->
    bbox at video_preds/<stem>_bbox.csv -> smoothed dir -> remap."""
    model_dir = _fake_model_dir(tmp_path)
    preds_dir = model_dir / "video_preds"
    preds_dir.mkdir()
    _write_preds_csv(preds_dir / "session1.csv")

    main(["create_bbox", str(model_dir), "session1.mp4", "--crop_ratio", "1.5"])
    bbox_file = preds_dir / "session1_bbox.csv"
    assert bbox_file.exists()
    bbox_df = pd.read_csv(bbox_file, index_col=0)
    assert list(bbox_df.columns) == ["x", "y", "h", "w"]
    assert (bbox_df["h"] % 2 == 0).all()  # even dims

    out_dir = tmp_path / "smoothed"
    main(["smooth_bbox", str(preds_dir), "--output_dir", str(out_dir)])
    assert (out_dir / "session1_bbox.csv").exists()
    assert (out_dir / "metadata.json").exists()

    # remap: subtract then add round-trips coordinates
    from lightning_pose_tpu.utils.cropzoom import generate_cropped_csv_file

    preds = preds_dir / "session1.csv"
    cropped = tmp_path / "cropped.csv"
    generate_cropped_csv_file(preds, bbox_file, cropped, mode="subtract")
    main(["remap", str(cropped), str(bbox_file), "--output_file",
          str(tmp_path / "restored.csv")])
    orig = pd.read_csv(preds, header=[0, 1, 2], index_col=0)
    restored = pd.read_csv(tmp_path / "restored.csv", header=[0, 1, 2], index_col=0)
    np.testing.assert_allclose(restored.to_numpy(), orig.to_numpy(), atol=1e-6)


def test_create_bbox_labeled_csv_conventions(tmp_path):
    """CSV inputs read image_preds/<csv>/predictions.csv and write
    image_preds/<csv>/bbox.csv (reference create_bbox.py:163-166)."""
    model_dir = _fake_model_dir(tmp_path)
    preds_dir = model_dir / "image_preds" / "labels.csv"
    preds_dir.mkdir(parents=True)
    _write_preds_csv(preds_dir / "predictions.csv")

    main(["create_bbox", str(model_dir), "labels.csv", "--crop_size", "96"])
    bbox_df = pd.read_csv(preds_dir / "bbox.csv", index_col=0)
    assert (bbox_df["h"] == 96).all() and (bbox_df["w"] == 96).all()


def test_create_bbox_flag_validation(tmp_path):
    """Mutual exclusion + range checks (reference create_bbox.py:125-145)."""
    model_dir = _fake_model_dir(tmp_path)
    (model_dir / "video_preds").mkdir(exist_ok=True)
    _write_preds_csv(model_dir / "video_preds" / "v.csv")

    with pytest.raises(ValueError, match="mutually exclusive"):
        main(["create_bbox", str(model_dir), "v.mp4",
              "--crop_ratio", "2.0", "--crop_size", "64"])
    with pytest.raises(ValueError, match="greater than 1"):
        main(["create_bbox", str(model_dir), "v.mp4", "--crop_ratio", "0.5"])
    with pytest.raises(ValueError, match="positive"):
        main(["create_bbox", str(model_dir), "v.mp4", "--crop_size", "-4"])
    # neither flag -> reference default crop_ratio 2.0 applies, no error
    main(["create_bbox", str(model_dir), "v.mp4"])
    assert (model_dir / "video_preds" / "v_bbox.csv").exists()


def test_crop_video_command(tmp_path, toy_data_dir):
    """Video crop via the model-dir conventions: bbox from
    video_preds/<stem>_bbox.csv, output cropped_videos/cropped_<name>.mp4
    (reference crop.py:130-143)."""
    import math
    import shutil

    import cv2

    video_src = f"{toy_data_dir}/videos/test_vid.mp4"
    video = tmp_path / "test_vid.mp4"
    shutil.copy(video_src, video)
    cap = cv2.VideoCapture(str(video))
    n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()

    model_dir = _fake_model_dir(tmp_path)
    preds_dir = model_dir / "video_preds"
    preds_dir.mkdir()
    bbox_df = pd.DataFrame(
        {
            "x": [50] * n_frames,
            "y": [60] * n_frames,
            "h": [100] * n_frames,
            "w": [100] * n_frames,
        }
    )
    bbox_df.to_csv(preds_dir / "test_vid_bbox.csv")

    main(["crop", str(model_dir), str(video)])
    out = model_dir / "cropped_videos" / "cropped_test_vid.mp4"
    assert out.exists()
    assert (model_dir / "cropped_images").is_dir()  # both dirs pre-created
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 100
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == n_frames
    cap.release()
    assert math.isfinite(n_frames)


def test_crop_labeled_frames_command(tmp_path, toy_data_dir):
    """CSV crop writes cropped_images/ + image_preds/<csv>/cropped_<csv>
    with --bbox_dir override (reference crop.py:144-160)."""
    import shutil

    # small labeled set: first 3 frames of the example project
    data_dir = tmp_path / "proj"
    labels = pd.read_csv(
        f"{toy_data_dir}/CollectedData.csv", header=[0, 1, 2], index_col=0
    ).iloc[:3]
    for img in labels.index:
        (data_dir / img).parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(f"{toy_data_dir}/{img}", data_dir / img)
    csv_file = data_dir / "labels.csv"
    labels.to_csv(csv_file)

    model_dir = _fake_model_dir(tmp_path, data_dir=data_dir)
    bbox_dir = tmp_path / "bboxes"
    bbox_dir.mkdir()
    pd.DataFrame(
        {"x": [10] * 3, "y": [10] * 3, "h": [64] * 3, "w": [64] * 3},
        index=labels.index,
    ).to_csv(bbox_dir / "bbox.csv")

    main(["crop", str(model_dir), str(csv_file), "--bbox_dir", str(bbox_dir)])
    out_csv = model_dir / "image_preds" / "labels.csv" / "cropped_labels.csv"
    assert out_csv.exists()
    cropped_imgs = list((model_dir / "cropped_images").rglob("*.png"))
    assert len(cropped_imgs) == 3


@pytest.mark.slow
def test_cli_train_and_predict_e2e(tmp_path, toy_data_dir):
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(
        f"""
data:
  image_resize_dims: {{height: 128, width: 128}}
  data_dir: {toy_data_dir}
  video_dir: {toy_data_dir}/videos
  csv_file: CollectedData.csv
  num_keypoints: 17
training:
  imgaug: default
  train_batch_size: 8
  train_prob: 0.8
  val_prob: 0.1
  train_frames: 8
  max_epochs: 1
  min_epochs: 1
  check_val_every_n_epoch: 1
  unfreezing_epoch: 0
  lr_scheduler_params: {{multisteplr: {{milestones: [1]}}}}
model:
  backbone: resnet18
  model_type: heatmap
  model_name: cli-e2e
eval:
  predict_vids_after_training: false
"""
    )
    out_dir = tmp_path / "model"
    assert main(["train", str(cfg_file), "--output_dir", str(out_dir)]) == 0
    assert (out_dir / "predictions.csv").exists()

    csv = f"{toy_data_dir}/CollectedData.csv"
    assert main(["predict", str(out_dir), csv]) == 0
    assert (out_dir / "image_preds" / "CollectedData.csv" / "predictions.csv").exists()


@pytest.mark.slow
def test_cli_predict_exported_runtime(tmp_path, toy_data_dir):
    """litpose export -> predict --runtime exported serves video inputs
    from the serialized XLA program (reference --runtime onnx analog),
    updating the hidden --progress_file."""
    import json

    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(
        f"""
data:
  image_resize_dims: {{height: 128, width: 128}}
  data_dir: {toy_data_dir}
  video_dir: {toy_data_dir}/videos
  csv_file: CollectedData.csv
  num_keypoints: 17
training:
  imgaug: default
  train_batch_size: 8
  train_prob: 0.8
  val_prob: 0.1
  train_frames: 8
  max_epochs: 1
  min_epochs: 1
  check_val_every_n_epoch: 1
  unfreezing_epoch: 0
  lr_scheduler_params: {{multisteplr: {{milestones: [1]}}}}
model:
  backbone: resnet18
  model_type: heatmap
  model_name: cli-exported
eval:
  predict_vids_after_training: false
dali:
  base: {{predict: {{sequence_length: 128}}}}
"""
    )
    out_dir = tmp_path / "model"
    assert main(["train", str(cfg_file), "--output_dir", str(out_dir)]) == 0
    assert main(["export", str(out_dir)]) == 0
    assert (out_dir / "exports_xla" / "predict.jax_export").exists()

    video = f"{toy_data_dir}/videos/test_vid.mp4"
    progress = tmp_path / "progress.json"
    assert main([
        "predict", str(out_dir), video, "--runtime", "exported",
        "--skip_viz", "--progress_file", str(progress),
    ]) == 0
    assert (out_dir / "video_preds" / "test_vid.csv").exists()
    payload = json.loads(progress.read_text())
    # per-batch granularity: 994 frames at seq_len 128 -> 8 batches
    assert payload["completed"] == payload["total"] == 8

    # CSV inputs are rejected on the exported runtime (fixed batch shapes)
    with pytest.raises(ValueError, match="video inputs only"):
        main([
            "predict", str(out_dir), f"{toy_data_dir}/CollectedData.csv",
            "--runtime", "exported",
        ])


def test_cli_type_validators(tmp_path):
    """Path-type validators fail fast with readable errors
    (reference cli/types.py:7-56)."""
    import argparse

    from lightning_pose_tpu.cli import types as cli_types

    yaml_file = tmp_path / "c.yaml"
    yaml_file.write_text("a: 1")
    assert cli_types.config_file(str(yaml_file)) == yaml_file
    with pytest.raises(argparse.ArgumentTypeError, match="File not found"):
        cli_types.config_file(str(tmp_path / "missing.yaml"))
    (tmp_path / "c.txt").write_text("x")
    with pytest.raises(argparse.ArgumentTypeError, match="must be a yaml"):
        cli_types.config_file(str(tmp_path / "c.txt"))

    assert cli_types.existing_model_dir(str(tmp_path)) == tmp_path
    with pytest.raises(argparse.ArgumentTypeError, match="does not exist"):
        cli_types.existing_model_dir(str(tmp_path / "missing"))


def test_friendly_parser_welcome_and_error(capsys):
    """Top-level help shows the welcome banner; argument errors print the
    full help before the error line (reference cli/friendly.py:9-47)."""
    from lightning_pose_tpu.cli.main import build_parser

    parser = build_parser()
    with pytest.raises(SystemExit) as exc:
        parser.parse_args(["--help"])
    assert exc.value.code == 0
    out = capsys.readouterr().out
    assert "Welcome to lightning-pose-tpu" in out
    assert "train" in out and "predict" in out

    with pytest.raises(SystemExit) as exc:
        parser.parse_args(["not-a-command"])
    assert exc.value.code == 2
    captured = capsys.readouterr()
    # full help on stderr, then the error line
    assert "usage:" in captured.err
    assert "error:" in captured.err

    # help text keeps paragraph structure via the formatter
    with pytest.raises(SystemExit):
        parser.parse_args(["predict", "--help"])
    sub_out = capsys.readouterr().out
    assert "Welcome" not in sub_out  # subcommands skip the banner


def test_train_detector_model_redirect(cfg, tmp_path, monkeypatch):
    """--detector_model redirects data paths to the detector's cropped
    outputs before training (reference cli/commands/train.py:97-114)."""
    import lightning_pose_tpu.train as train_mod
    from lightning_pose_tpu.cli.main import main

    config_file = tmp_path / "config.yaml"
    c = cfg.copy()
    c.data.csv_file = "CollectedData.csv"
    c.save(str(config_file))

    captured = {}

    def fake_train(cfg_in, model_dir=None, **kwargs):
        captured["cfg"] = cfg_in
        return None

    monkeypatch.setattr(train_mod, "train", fake_train)

    detector_dir = tmp_path / "detector"
    rc = main([
        "train", str(config_file),
        "--detector_model", str(detector_dir),
        "--output_dir", str(tmp_path / "out"),
    ])
    assert rc == 0
    got = captured["cfg"]
    assert got.data.data_dir == str(detector_dir / "cropped_images")
    assert got.data.video_dir == str(detector_dir / "cropped_videos")
    assert got.data.csv_file == str(
        detector_dir / "image_preds" / "CollectedData.csv"
        / "cropped_CollectedData.csv"
    )


@pytest.mark.slow
def test_cli_predict_multiview_dir_dispatch(cfg, mv_data_dir, tmp_path):
    """`litpose predict <mv_model> <videos_dir>` groups per-view videos by
    session and writes one CSV per view (reference multiview dispatch)."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.cli.main import main
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
    c.model.model_name = "cli-mv"
    c.dali.base.predict.sequence_length = 8

    module, _ = get_model(c, num_keypoints=7)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 128, 128, 3)), train=False
    )
    model_dir = tmp_path / "mv_model"
    vdir = ckpt_utils.next_version_dir(str(model_dir), "cli-mv")
    cdir = ckpt_utils.checkpoint_dir(vdir)
    ckpt_utils.save_checkpoint(
        f"{cdir}/epoch=0-step=0-best.ckpt",
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        step=0, epoch=0,
    )
    ckpt_utils.wait_for_saves()
    c.save(str(model_dir / "config.yaml"))

    rc = main([
        "predict", str(model_dir), f"{mv_data_dir}/videos", "--skip_viz",
    ])
    assert rc == 0
    preds = sorted((model_dir / "video_preds").glob("*.csv"))
    stems = {p.stem for p in preds if "_error" not in p.stem
             and "temporal" not in p.stem}
    # one CSV per view per session
    assert any(s.endswith("_top") for s in stems)
    assert any(s.endswith("_bot") for s in stems)
