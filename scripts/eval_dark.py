"""Soft-argmax vs DARK decode comparison on trained models.

Trains a small real model on the bundled mirror-mouse data (100 epochs,
256px for single-view; the synthesized 2-view split for multiview), then
evaluates BOTH decoders on the labeled frames with the true train/val/test
split and prints pixel error by split.

    python scripts/eval_dark.py heatmap [out_root]
    python scripts/eval_dark.py heatmap_mhcrnn [out_root]
    python scripts/eval_dark.py heatmap_multiview [out_root]

Reference decode: models/heads/heatmap.py:103-144 (soft-argmax); DARK is
the opt-in arXiv:1910.06278 decoder (ops/dark.py). Results feed the
promote-or-keep-opt-in decision recorded in
docs/user_guide_advanced/increasing_inference_speed.md.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
import pandas as pd

DATA_DIR = Path("/root/reference/data/mirror-mouse-example")
Y_SPLIT = 168  # mirror-mouse top/bottom split row (same as tests/conftest)


def make_multiview_split(out: Path) -> None:
    """Synthesize the 2-view dataset by splitting mirror-mouse at y=168
    (the reference's mirror-mouse-separate layout)."""
    import cv2

    if (out / "top.csv").exists():
        return
    (out / "labeled-data" / "example_top").mkdir(parents=True, exist_ok=True)
    (out / "labeled-data" / "example_bot").mkdir(parents=True, exist_ok=True)
    (out / "videos").mkdir(parents=True, exist_ok=True)
    src_ld = DATA_DIR / "labeled-data"
    for frame in os.listdir(src_ld):
        img = cv2.imread(str(src_ld / frame))
        cv2.imwrite(str(out / "labeled-data" / "example_top" / frame), img[:Y_SPLIT])
        cv2.imwrite(str(out / "labeled-data" / "example_bot" / frame), img[Y_SPLIT:])
    df_og = pd.read_csv(
        DATA_DIR / "CollectedData.csv", header=[0, 1, 2], index_col=0
    )
    df_top = df_og.filter(regex="_top").drop(columns=["obs_top"], level=1)
    df_bot = df_og.filter(regex="_bot").drop(
        columns=["obsHigh_bot", "obsLow_bot"], level=1
    )
    df_bot.loc[:, df_bot.columns.get_level_values("coords") == "y"] -= Y_SPLIT

    def relabel(df, view):
        df = df.copy()
        df.index = [
            p.replace("labeled-data/", f"labeled-data/example_{view}/")
            for p in df.index
        ]
        # strip the view suffix so keypoint names match across views
        df.columns = pd.MultiIndex.from_tuples(
            [(a, b.replace(f"_{view}", ""), c) for a, b, c in df.columns],
            names=df.columns.names,
        )
        return df

    relabel(df_top, "top").to_csv(out / "top.csv")
    relabel(df_bot, "bot").to_csv(out / "bot.csv")


def base_overrides(data_dir: Path, model_type: str) -> list[str]:
    epochs = int(os.environ.get("EVAL_DARK_EPOCHS", "100"))  # smoke tests
    ov = [
        f"data.data_dir={data_dir}",
        f"data.video_dir={data_dir}/videos",
        "training.train_prob=0.8",
        "training.val_prob=0.1",
        f"training.max_epochs={epochs}",
        f"training.min_epochs={epochs}",
        "training.lr_scheduler_params.multisteplr.milestones="
        f"[{epochs // 2},{epochs * 3 // 4}]",
        f"training.check_val_every_n_epoch={max(1, min(20, epochs // 5))}",
        "training.unfreezing_epoch=0",
        f"model.model_type={model_type}",
        f"model.model_name=dark-eval-{model_type}",
        "eval.predict_vids_after_training=false",
    ]
    if model_type == "heatmap_multiview":
        ov += [
            "data.num_keypoints=7",
            "data.csv_file=[top.csv, bot.csv]",
            "data.view_names=[top, bot]",
            "data.keypoint_names=null",
            "data.mirrored_column_matches=null",
            "data.columns_for_singleview_pca=null",
            "data.image_resize_dims.height=256",
            "data.image_resize_dims.width=256",
            "training.imgaug=dlc-mv",
            "training.train_batch_size=4",
            "model.backbone=vits_dino",
        ]
    else:
        ov += [
            "data.num_keypoints=17",
            "data.image_resize_dims.height=256",
            "data.image_resize_dims.width=256",
            "model.backbone=resnet50",
        ]
        if model_type == "heatmap_mhcrnn":
            ov += ["training.train_batch_size=8"]
    return ov


def pixel_error_by_split(preds: pd.DataFrame, labels: pd.DataFrame) -> pd.Series:
    """Mean Euclidean keypoint error grouped by the predictions' set column."""
    sets = preds.loc[:, preds.columns.get_level_values(0) == "set"].iloc[:, 0]
    xy = preds.columns.get_level_values("coords").isin(["x", "y"])
    p = preds.loc[:, xy].to_numpy(float).reshape(len(preds), -1, 2)
    g = (
        labels.loc[:, labels.columns.get_level_values("coords").isin(["x", "y"])]
        .to_numpy(float)
        .reshape(len(labels), -1, 2)
    )
    err = np.sqrt(((p - g) ** 2).sum(-1))  # (frames, keypoints)
    per_frame = pd.Series(np.nanmean(err, axis=1), index=preds.index)
    return per_frame.groupby(sets.to_numpy()).mean()


def _train_complete(model_dir: Path) -> bool:
    import json

    status = model_dir / "train_status.json"
    if not status.exists():
        return False
    try:
        return json.loads(status.read_text()).get("status") == "COMPLETED"
    except (json.JSONDecodeError, OSError):
        return False


def _force_cpu_if_requested() -> None:
    """EVAL_DARK_CPU=1 runs on CPU (plumbing smoke tests; the axon TPU
    plugin overrides JAX_PLATFORMS so we must force in-process)."""
    if os.environ.get("EVAL_DARK_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")


def _train_child(model_type: str, data_dir: Path, model_dir: Path,
                 resume: bool) -> None:
    import jax

    _force_cpu_if_requested()
    # persistent compile cache so watchdog restarts skip the cold compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/lp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lightning_pose_tpu.config import load_config
    from lightning_pose_tpu.train import train

    cfg = load_config()
    cfg.apply_overrides(
        base_overrides(data_dir, model_type)
        + (["training.resume=true"] if resume else [])
    )
    train(cfg, model_dir=model_dir, skip_evaluation=True)


# remote-TPU tunnel RPCs can hang for many minutes; train in a watched
# child process and kill+resume on stall (same recipe as semisup_demo.py)
STALL_SECS = int(os.environ.get("EVAL_DARK_STALL_SECS", "900"))
MAX_ATTEMPTS = 6


def _newest_mtime(out_dir: Path) -> float:
    newest = 0.0
    if out_dir.exists():
        for p in out_dir.rglob("*"):
            try:
                newest = max(newest, p.stat().st_mtime)
            except OSError:
                pass
    return newest


def _train_watched(model_type: str, out_root: Path, model_dir: Path) -> None:
    import subprocess
    import time

    for attempt in range(MAX_ATTEMPTS):
        cmd = [sys.executable, os.path.abspath(__file__), model_type,
               str(out_root), "--child-train"]
        if attempt > 0:
            cmd.append("--resume")
        proc = subprocess.Popen(cmd)
        start = time.time()
        while proc.poll() is None:
            time.sleep(30)
            last = max(_newest_mtime(model_dir), start)
            if time.time() - last > STALL_SECS:
                print(f"[watchdog] attempt {attempt + 1}: no progress for "
                      f"{STALL_SECS}s — killing (tunnel hang?)", flush=True)
                proc.kill()
                proc.wait()
                break
        if proc.returncode == 0:
            return
        time.sleep(30)
    raise SystemExit(f"{model_type}: training failed after "
                     f"{MAX_ATTEMPTS} attempts")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    model_type = args[0] if args else "heatmap"
    # resolve before building config overrides: return_absolute_data_paths
    # resolves relative dirs against cwd[:-3] (the reference's hydra-run-dir
    # convention), which would send "outputs/..." to "/outputs/..."
    out_root = Path(args[1] if len(args) > 1 else "outputs/dark_eval").resolve()
    model_dir = out_root / model_type

    if model_type == "heatmap_multiview":
        data_dir = out_root / "mv_data"
        make_multiview_split(data_dir)
    else:
        data_dir = DATA_DIR

    if "--child-train" in sys.argv:
        _train_child(model_type, data_dir, model_dir,
                     resume="--resume" in sys.argv)
        return

    if not _train_complete(model_dir):
        _train_watched(model_type, out_root, model_dir)

    _force_cpu_if_requested()
    from lightning_pose_tpu.api.model import Model
    from lightning_pose_tpu.config import load_config as _lc

    results = {}
    for method in ("softargmax", "dark"):
        cfg = _lc(str(model_dir / "config.yaml"))
        cfg.eval.decode_method = method
        cfg.save(str(model_dir / "config.yaml"))
        m = Model.from_dir(model_dir)
        if model_type == "heatmap_multiview":
            out = m.predict_on_label_csv_multiview(
                csv_file_per_view=["top.csv", "bot.csv"],
                compute_metrics=False,
                add_train_val_test_set=True,
            )
            errs = []
            for view in ("top", "bot"):
                labels = pd.read_csv(
                    data_dir / f"{view}.csv", header=[0, 1, 2], index_col=0
                )
                errs.append(
                    pixel_error_by_split(out.predictions[view], labels)
                )
            results[method] = sum(errs) / len(errs)
        else:
            out = m.predict_on_label_csv(
                csv_file=str(data_dir / "CollectedData.csv"),
                compute_metrics=False,
                add_train_val_test_set=True,
            )
            labels = pd.read_csv(
                data_dir / "CollectedData.csv", header=[0, 1, 2], index_col=0
            )
            results[method] = pixel_error_by_split(out.predictions, labels)

    table = pd.DataFrame(results)
    print(f"\n=== {model_type}: pixel error by split (px, original res) ===")
    print(table.round(3).to_string())
    table.to_csv(model_dir / "dark_vs_softargmax.csv")


if __name__ == "__main__":
    main()
