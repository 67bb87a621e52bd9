"""End-to-end demo on the bundled mirror-mouse dataset
(the reference ships scripts/litpose_training_demo.ipynb).

    python scripts/demo.py [output_dir]

Trains a small supervised model, predicts the labeled frames and the test
video, and prints the resulting pixel errors.
"""

import sys
from pathlib import Path


def main() -> None:
    out_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "outputs/demo")

    from lightning_pose_tpu import LP_ROOT_PATH
    from lightning_pose_tpu.config import load_config
    from lightning_pose_tpu.train import train

    data_dir = Path(LP_ROOT_PATH) / "data" / "mirror-mouse-example"
    if not data_dir.exists():
        data_dir = Path("/root/reference/data/mirror-mouse-example")
    if not data_dir.exists():
        raise SystemExit("mirror-mouse example data not found")

    cfg = load_config()
    cfg.apply_overrides(
        [
            f"data.data_dir={data_dir}",
            f"data.video_dir={data_dir}/videos",
            "data.num_keypoints=17",
            "data.image_resize_dims.height=256",
            "data.image_resize_dims.width=256",
            "training.train_prob=0.8",
            "training.val_prob=0.1",
            "training.max_epochs=100",
            "training.lr_scheduler_params.multisteplr.milestones=[50,75]",
            "training.min_epochs=100",
            "training.check_val_every_n_epoch=20",
            "training.unfreezing_epoch=0",
            "model.backbone=resnet50",
            "model.model_type=heatmap",
            "model.model_name=demo",
            "eval.predict_vids_after_training=true",
            "eval.save_vids_after_training=true",
        ]
    )
    train(cfg, model_dir=out_dir)

    import pandas as pd

    err = pd.read_csv(out_dir / "predictions_pixel_error.csv", index_col=0)
    by_set = err.groupby("set").mean(numeric_only=True).mean(axis=1)
    print("\npixel error by split:")
    print(by_set.to_string())
    print(f"\nartifacts in {out_dir}/ (predictions.csv, video_preds/, tb_logs/)")


if __name__ == "__main__":
    main()
