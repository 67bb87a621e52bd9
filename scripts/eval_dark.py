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
    ov = [
        f"data.data_dir={data_dir}",
        f"data.video_dir={data_dir}/videos",
        "training.train_prob=0.8",
        "training.val_prob=0.1",
        "training.max_epochs=100",
        "training.min_epochs=100",
        "training.lr_scheduler_params.multisteplr.milestones=[50,75]",
        "training.check_val_every_n_epoch=20",
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


def main() -> None:
    model_type = sys.argv[1] if len(sys.argv) > 1 else "heatmap"
    out_root = Path(sys.argv[2] if len(sys.argv) > 2 else "outputs/dark_eval")
    model_dir = out_root / model_type

    from lightning_pose_tpu.config import load_config
    from lightning_pose_tpu.train import train

    if model_type == "heatmap_multiview":
        data_dir = out_root / "mv_data"
        make_multiview_split(data_dir)
    else:
        data_dir = DATA_DIR

    if not (model_dir / "config.yaml").exists():
        cfg = load_config()
        cfg.apply_overrides(base_overrides(data_dir, model_type))
        train(cfg, model_dir=model_dir, skip_evaluation=True)

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
