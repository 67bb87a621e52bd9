"""Accuracy-breadth demo: train the remaining model families to
convergence on the bundled mirror-mouse data and report pixel errors.

The supervised ResNet-50 heatmap tracker already has a real-hardware
convergence number (scripts/demo.py); this script gives the other two
families the same 100-epoch treatment (reference families:
heatmap_tracker_mhcrnn.py:30, heatmap_tracker_multiview.py:32):

  mhcrnn     — temporal context heads on mirror-mouse (17 keypoints)
  multiview  — cross-view token transformer (vits_dino) on a 2-view
               dataset synthesized by splitting mirror-mouse at y=168
               (the reference's own multiview test construction,
               reference tests/conftest.py:107-198)

    python scripts/model_zoo_demo.py [output_root] [--only mhcrnn|multiview]

Runs under the tunnel stall watchdog (scripts/watchdog.py) with
training.resume=true retries. MODEL_ZOO_EPOCHS / MODEL_ZOO_CPU shrink the
run for plumbing smoke tests.
"""

import os
import sys
from pathlib import Path


def make_mv_data(root: Path) -> Path:
    """Split mirror-mouse into a persistent 2-view dataset (top/bot views,
    7 shared keypoints) at ``root/mv_data``; reused when present."""
    import cv2
    import pandas as pd

    from lightning_pose_tpu import LP_ROOT_PATH

    src = Path(LP_ROOT_PATH) / "data" / "mirror-mouse-example"
    if not src.exists():
        src = Path("/root/reference/data/mirror-mouse-example")
    out = root / "mv_data"
    if (out / "top.csv").exists():
        return out
    y_split = 168
    for view in ("top", "bot"):
        (out / "labeled-data" / f"example_{view}").mkdir(
            parents=True, exist_ok=True)
    (out / "videos").mkdir(parents=True, exist_ok=True)

    src_ld = src / "labeled-data"
    for frame in os.listdir(src_ld):
        img = cv2.imread(str(src_ld / frame))
        cv2.imwrite(str(out / "labeled-data" / "example_top" / frame),
                    img[:y_split])
        cv2.imwrite(str(out / "labeled-data" / "example_bot" / frame),
                    img[y_split:])

    for video in os.listdir(src / "videos"):
        cap = cv2.VideoCapture(str(src / "videos" / video))
        fps = cap.get(cv2.CAP_PROP_FPS)
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        four = cv2.VideoWriter_fourcc(*"mp4v")
        wt = cv2.VideoWriter(
            str(out / "videos" / video.replace(".mp4", "_top.mp4")),
            four, fps, (w, y_split))
        wb = cv2.VideoWriter(
            str(out / "videos" / video.replace(".mp4", "_bot.mp4")),
            four, fps, (w, h - y_split))
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            wt.write(frame[:y_split])
            wb.write(frame[y_split:])
        cap.release(); wt.release(); wb.release()

    df_og = pd.read_csv(src / "CollectedData.csv",
                        header=[0, 1, 2], index_col=0)
    df_top = df_og.filter(regex="_top").drop(columns=["obs_top"], level=1)
    df_bot = df_og.filter(regex="_bot").drop(
        columns=["obsHigh_bot", "obsLow_bot"], level=1)
    df_bot.loc[:, df_bot.columns.get_level_values("coords") == "y"] -= y_split
    for df, view in ((df_top, "top"), (df_bot, "bot")):
        df.index = pd.Index([
            "/".join([d.split("/")[0], f"example_{view}", d.split("/")[1]])
            for d in df.index])
        df.columns = pd.MultiIndex.from_tuples(
            [(a, b.replace(f"_{view}", ""), c) for a, b, c in df.columns],
            names=df.columns.names)
        df.to_csv(out / f"{view}.csv")
    return out


def run_one(root: Path, name: str, resume: bool = False) -> dict:
    import jax

    if os.environ.get("MODEL_ZOO_CPU"):  # plumbing smoke tests
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/lp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lightning_pose_tpu import LP_ROOT_PATH
    from lightning_pose_tpu.config import load_config
    from lightning_pose_tpu.train import train

    out_dir = root / name
    err_names = (["predictions_pixel_error.csv"] if name == "mhcrnn" else
                 ["predictions_top_pixel_error.csv",
                  "predictions_bot_pixel_error.csv"])
    epochs = int(os.environ.get("MODEL_ZOO_EPOCHS", "100"))
    resize = int(os.environ.get("MODEL_ZOO_RESIZE", "256"))
    milestones = f"[{epochs // 2},{epochs * 3 // 4}]"
    val_every = max(1, min(20, epochs // 5))

    if not (out_dir / err_names[0]).exists():
        cfg = load_config()
        common = [
            f"data.image_resize_dims.height={resize}",
            f"data.image_resize_dims.width={resize}",
            "training.train_prob=0.8",
            "training.val_prob=0.1",
            f"training.max_epochs={epochs}",
            f"training.min_epochs={epochs}",
            f"training.lr_scheduler_params.multisteplr.milestones={milestones}",
            f"training.check_val_every_n_epoch={val_every}",
            "training.unfreezing_epoch=0",
            f"model.model_name={name}",
            "eval.predict_vids_after_training=false",
        ] + (["training.resume=true"] if resume else [])
        if name == "mhcrnn":
            data_dir = Path(LP_ROOT_PATH) / "data" / "mirror-mouse-example"
            if not data_dir.exists():
                data_dir = Path("/root/reference/data/mirror-mouse-example")
            cfg.apply_overrides(common + [
                f"data.data_dir={data_dir}",
                f"data.video_dir={data_dir}/videos",
                "data.num_keypoints=17",
                "model.backbone="
                + os.environ.get("MODEL_ZOO_BACKBONE", "resnet50"),
                "model.model_type=heatmap_mhcrnn",
                # bs8 like the eval_dark convergence run: at ~209 train
                # frames and fixed 100 epochs, bs16 halves the optimizer
                # steps and lands ~5 px worse (14.4 vs 9.45 test)
                "training.train_batch_size=8",
            ])
        elif name == "multiview":
            data_dir = make_mv_data(root)
            # the reference's published multiview recipe
            # (reference scripts/configs/config_default_multiview.yaml:100-113):
            # 300 epochs, milestones [150,200,250], patch masking ramped
            # 0 -> 0.5 over epochs 40 -> 300. MODEL_ZOO_MV_EPOCHS scales the
            # schedule proportionally for smoke runs.
            mv_epochs = int(os.environ.get("MODEL_ZOO_MV_EPOCHS", "300"))
            mv_miles = [mv_epochs // 2, mv_epochs * 2 // 3, mv_epochs * 5 // 6]
            cfg.apply_overrides(common + [
                f"data.data_dir={data_dir}",
                f"data.video_dir={data_dir}/videos",
                "data.csv_file=[top.csv,bot.csv]",
                "data.view_names=[top,bot]",
                "data.num_keypoints=7",
                "data.keypoint_names=null",
                "data.mirrored_column_matches=[0,1,2,3,4,5,6]",
                "data.columns_for_singleview_pca=null",
                "training.imgaug=dlc-mv",
                f"training.max_epochs={mv_epochs}",
                f"training.min_epochs={mv_epochs}",
                "training.lr_scheduler_params.multisteplr.milestones="
                f"[{mv_miles[0]},{mv_miles[1]},{mv_miles[2]}]",
                f"training.check_val_every_n_epoch="
                f"{max(1, min(20, mv_epochs // 5))}",
                f"training.patch_mask.init_epoch={mv_epochs * 40 // 300}",
                f"training.patch_mask.final_epoch={mv_epochs}",
                "training.patch_mask.init_ratio=0.0",
                "training.patch_mask.final_ratio=0.5",
                "model.backbone="
                + os.environ.get("MODEL_ZOO_MV_BACKBONE", "vits_dino"),
                "model.model_type=heatmap_multiview",
            ])
        else:
            raise SystemExit(f"unknown run {name}")
        train(cfg, model_dir=out_dir)
    else:
        print(f"reusing completed run in {out_dir}", flush=True)

    import pandas as pd

    frames = [pd.read_csv(out_dir / f, index_col=0) for f in err_names]
    err = pd.concat(frames)
    by_set = err.groupby("set").mean(numeric_only=True).mean(axis=1)
    return by_set.to_dict()


RUNS = ["mhcrnn", "multiview"]
STALL_SECS = int(os.environ.get("MODEL_ZOO_STALL_SECS", "900"))


def main() -> None:
    import json

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    # resolve before spawning children: config data_dir overrides must be
    # absolute (return_absolute_path resolves relative paths against the
    # hydra-style run dir, not the cwd)
    root = Path(args[0] if args and args[0] not in RUNS
                else "outputs/model_zoo").resolve()

    if "--child" in sys.argv:
        name = sys.argv[sys.argv.index("--child") + 1]
        res = run_one(root, name, resume="--resume" in sys.argv)
        print(json.dumps(res), flush=True)
        return

    runs = RUNS
    if "--only" in sys.argv:
        runs = [sys.argv[sys.argv.index("--only") + 1]]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from watchdog import run_watched

    results = {}
    for name in runs:
        print(f"\n=== training {name} ===", flush=True)
        results[name] = run_watched(__file__, root, name, STALL_SECS)
        print(f"{name}: {results[name]}", flush=True)

    print("\npixel error by split (original-resolution px):")
    print(f"{'split':12s}" + "".join(f"{n:>12s}" for n in runs))
    for split in ("train", "validation", "test"):
        row = "".join(
            f"{results[n].get(split, float('nan')):12.3f}" for n in runs)
        print(f"{split:12s}{row}")


if __name__ == "__main__":
    main()
