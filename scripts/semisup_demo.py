"""Semi-supervised accuracy demonstration on the bundled mirror-mouse data.

Trains two models with LIMITED labels (train_frames=35 of the 90-frame
example dataset; the singleview PCA fit needs more samples than its 28
observation dimensions) and compares held-out pixel error:

  A. supervised-only ResNet-50 heatmap
  B. the same + unsupervised losses over the unlabeled test video
     (pca_singleview + temporal, the reference's mirror-mouse config:
     /root/reference/scripts/configs/config_mirror-mouse-example.yaml:64,
     anneal from epoch 0 per that config's callbacks.anneal_weight)

This is the framework's headline capability (reference README: semi-
supervised losses improve accuracy in the low-label regime), demonstrated
end-to-end on real hardware.

    python scripts/semisup_demo.py [output_root]
"""

import os
import sys
from pathlib import Path


def run_one(out_dir: Path, losses: list[str], resume: bool = False) -> dict:
    import jax

    if os.environ.get("SEMISUP_DEMO_CPU"):  # plumbing smoke tests
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: watchdog restarts skip the cold compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/lp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lightning_pose_tpu import LP_ROOT_PATH
    from lightning_pose_tpu.config import load_config
    from lightning_pose_tpu.train import train

    data_dir = Path(LP_ROOT_PATH) / "data" / "mirror-mouse-example"
    if not data_dir.exists():
        data_dir = Path("/root/reference/data/mirror-mouse-example")
    if not data_dir.exists():
        raise SystemExit("mirror-mouse example data not found")

    err_file = out_dir / "predictions_pixel_error.csv"
    if err_file.exists():
        print(f"reusing completed run in {out_dir}", flush=True)
        import pandas as pd

        err = pd.read_csv(err_file, index_col=0)
        return err.groupby("set").mean(numeric_only=True).mean(axis=1).to_dict()

    # SEMISUP_DEMO_EPOCHS shrinks the run for plumbing smoke tests
    epochs = int(os.environ.get("SEMISUP_DEMO_EPOCHS", "150"))
    milestones = [int(epochs * 2 / 3), int(epochs * 5 / 6)]
    val_every = max(1, min(25, epochs // 6))
    loss_list = "[" + ",".join(losses) + "]"
    cfg = load_config()
    cfg.apply_overrides(
        [
            f"data.data_dir={data_dir}",
            f"data.video_dir={data_dir}/videos",
            "data.num_keypoints=17",
            "data.image_resize_dims.height=256",
            "data.image_resize_dims.width=256",
            # mirror-mouse PCA setup (reference config lines 32-35)
            "data.columns_for_singleview_pca=[0,1,2,3,4,5,6,8,9,10,11,12,13,14]",
            "training.train_prob=0.8",
            "training.val_prob=0.1",
            "training.train_frames=35",
            f"training.max_epochs={epochs}",
            f"training.min_epochs={epochs}",
            "training.lr_scheduler_params.multisteplr.milestones="
            f"[{milestones[0]},{milestones[1]}]",
            f"training.check_val_every_n_epoch={val_every}",
            "training.unfreezing_epoch=0",
            # unsup importance ramps from epoch 0 (reference mirror-mouse cfg)
            "callbacks.anneal_weight.freeze_until_epoch=0",
            "model.backbone=resnet50",
            "model.model_type=heatmap",
            f"model.losses_to_use={loss_list}",
            "eval.predict_vids_after_training=false",
        ]
        + (["training.resume=true"] if resume else [])
    )
    train(cfg, model_dir=out_dir)

    import pandas as pd

    err = pd.read_csv(out_dir / "predictions_pixel_error.csv", index_col=0)
    by_set = err.groupby("set").mean(numeric_only=True).mean(axis=1)
    return by_set.to_dict()


RUNS = {
    "supervised": [],
    "semisup": ["pca_singleview", "temporal"],
}

# stall watchdog (scripts/watchdog.py): kill + resume on tunnel hangs
STALL_SECS = int(os.environ.get("SEMISUP_DEMO_STALL_SECS", "900"))


def _run_watched(root: Path, name: str) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from watchdog import run_watched

    return run_watched(__file__, root, name, STALL_SECS)


def main() -> None:
    import json

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    root = Path(args[0] if args else "outputs/semisup_demo")

    if "--child" in sys.argv:
        name = sys.argv[sys.argv.index("--child") + 1]
        res = run_one(root / name, RUNS[name], resume="--resume" in sys.argv)
        print(json.dumps(res), flush=True)
        return

    results = {}
    for name, losses in RUNS.items():
        print(f"\n=== training {name} (losses={losses}) ===", flush=True)
        results[name] = _run_watched(root, name)
        print(f"{name}: {results[name]}", flush=True)

    print("\npixel error by split (35 labeled train frames, 406x396 px):")
    print(f"{'split':8s} {'supervised':>12s} {'semisup':>12s}")
    for split in ("train", "validation", "test"):
        a = results["supervised"].get(split, float("nan"))
        b = results["semisup"].get(split, float("nan"))
        print(f"{split:8s} {a:12.3f} {b:12.3f}")


if __name__ == "__main__":
    main()
