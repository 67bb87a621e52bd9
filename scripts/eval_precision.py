"""bf16-vs-fp32 keypoint deviation on a trained model.

The reference records keypoint-prediction deviation under reduced
precision (<0.01 px fp16 vs fp32 on A100, mixed_precision.rst:170-173)
and under compiled runtimes (<0.08 px, increasing_inference_speed.rst:21-26).
This script is the TPU counterpart: it predicts the labeled frames twice
— once with the default bf16 compute path, once in full fp32 — and
reports the per-keypoint coordinate deviation in original-image pixels.

    python scripts/eval_precision.py <model_dir> [csv_file] [data_dir]

Writes deviation stats to <model_dir>/precision_deviation.json and prints
them. The decode always runs fp32 (see docs/user_guide_advanced/
mixed_precision.md); precision only affects backbone/head features.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    model_dir = Path(sys.argv[1]).resolve()

    from lightning_pose_tpu.api.model import Model

    out: dict[str, Path] = {}
    for precision in ("fp32", "bf16"):
        model = Model.from_dir(model_dir, precision=precision)
        if isinstance(model.cfg.data.csv_file, (list, tuple)):
            raise SystemExit(
                "eval_precision.py supports single-view models only; "
                "this model is multiview (cfg.data.csv_file is a list)."
            )
        csv_file = sys.argv[2] if len(sys.argv) > 2 else (
            Path(model.cfg.data.data_dir) / model.cfg.data.csv_file
        )
        data_dir = sys.argv[3] if len(sys.argv) > 3 else None
        out_dir = model_dir / f"precision_eval_{precision}"
        model.predict_on_label_csv(
            csv_file, data_dir=data_dir, compute_metrics=False,
            output_dir=out_dir,
        )
        out[precision] = out_dir / "predictions.csv"

    dfs = {
        k: pd.read_csv(v, header=[0, 1, 2], index_col=0) for k, v in out.items()
    }
    coords = {}
    for k, df in dfs.items():
        sub = df.loc[:, df.columns.get_level_values("coords").isin(["x", "y"])]
        sub = sub.drop(columns=["set"], level=0, errors="ignore")
        coords[k] = sub.to_numpy(dtype=np.float64)
    xy32, xy16 = coords["fp32"], coords["bf16"]
    # per-keypoint euclidean deviation in original-image pixels
    dev = np.sqrt(
        ((xy32 - xy16).reshape(len(xy32), -1, 2) ** 2).sum(-1)
    ).ravel()
    # a NaN/Inf prediction under bf16 is the worst precision failure this
    # script exists to catch — report those explicitly, never drop them
    finite = np.isfinite(dev)
    n_nonfinite = int((~finite).sum())
    dev = dev[finite]
    if dev.size == 0:
        raise SystemExit(
            f"no finite deviations to report ({n_nonfinite} non-finite "
            "keypoint deviations — one of the precision paths produced "
            "NaN/Inf predictions everywhere)"
        )
    stats = {
        "n_keypoints": int(dev.size),
        "n_nonfinite": n_nonfinite,
        "median_px": float(np.median(dev)),
        "mean_px": float(dev.mean()),
        "p99_px": float(np.percentile(dev, 99)),
        "max_px": float(dev.max()),
    }
    (model_dir / "precision_deviation.json").write_text(json.dumps(stats, indent=2))
    print("bf16 vs fp32 keypoint deviation (original-image px):")
    for k, v in stats.items():
        print(f"  {k:12s} {v}")


if __name__ == "__main__":
    main()
