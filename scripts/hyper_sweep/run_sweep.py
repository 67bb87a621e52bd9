"""Hyperparameter sweep launcher (reference scripts/hyper-sweep/run_sweep.py).

The reference launches sweeps on Lightning AI cloud; this version runs a
grid of config overrides locally (sequentially — each job owns the full
TPU mesh), writing one model directory per combination.

Usage:
    python scripts/hyper_sweep/run_sweep.py config.yaml \
        --sweep training.optimizer_params.learning_rate=1e-3,5e-4 \
        --sweep model.backbone=resnet50,vits_dino \
        --output_root outputs/sweep
"""

import argparse
import itertools
import os
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("config_file", type=Path)
    parser.add_argument(
        "--sweep", action="append", default=[], metavar="KEY=V1,V2,...",
        help="sweep axis: config key with comma-separated values",
    )
    parser.add_argument("--output_root", type=Path, default=Path("outputs/sweep"))
    args = parser.parse_args()

    axes = []
    for spec in args.sweep:
        key, _, raw = spec.partition("=")
        axes.append([(key, v) for v in raw.split(",")])

    from lightning_pose_tpu.config import load_config
    from lightning_pose_tpu.train import train

    combos = list(itertools.product(*axes)) if axes else [()]
    print(f"sweep: {len(combos)} job(s)")
    for i, combo in enumerate(combos):
        overrides = [f"{k}={v}" for k, v in combo]
        job_name = "_".join(f"{k.split('.')[-1]}-{v}" for k, v in combo) or "base"
        out_dir = args.output_root / f"job{i:03d}_{job_name}"
        print(f"[{i + 1}/{len(combos)}] {overrides} -> {out_dir}")
        cfg = load_config(str(args.config_file), overrides=overrides)
        os.makedirs(out_dir, exist_ok=True)
        train(cfg, model_dir=out_dir)


if __name__ == "__main__":
    main()
