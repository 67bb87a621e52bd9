"""Controlled mhcrnn-vs-heatmap comparison + per-head diagnosis.

Round-4 finding (docs/architecture.md accuracy table): heatmap_mhcrnn
underperformed the single-frame heatmap tracker on mirror-mouse
(test 9.45 vs 7.4 px) while overfitting train (2.49 px) — inverting the
model's reason to exist (reference heatmap_tracker_mhcrnn.py:30). The
round-3/4 runs were NOT schedule-controlled (bs16@100ep vs bs8@100ep).

Root-cause hypothesis (measured, see `adjacency_report`): the bundled
mirror-mouse labeled frames img00..img92 are temporally DISTANT samples —
mean |img_n - img_{n+1}| is ~15-18 gray vs ~6.4 for true adjacent video
frames — so the reference's index-adjacency context rule
(reference utils/io.py:497 ``get_context_img_paths``) feeds the
multi-frame head stacks of uncorrelated frames on this dataset.

This script trains THREE runs under one controlled protocol (bs8, 100
epochs, milestones [50,75], 256px, resnet50, same seed/splits):

  heatmap        — single-frame control arm
  mhcrnn         — stock context (index-adjacent frames)
  mhcrnn-repeat  — 5x repeated center frame as context (isolates the
                   distant-context hypothesis: if this arm matches the
                   single-frame control, the architecture/merge is sound
                   and the stock arm's gap is the data's missing context)

then evaluates pixel error by split for all three, plus a per-head
breakdown of the mhcrnn arms (SF head alone, MF head alone, merged, and
the fraction of keypoints where the MF head won the confidence merge).

    python scripts/mhcrnn_controlled.py [out_root] [--only NAME]

Env: MHCRNN_CTRL_EPOCHS / MHCRNN_CTRL_CPU shrink/redirect for smoke tests.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np
import pandas as pd

DATA_DIR = Path("/root/reference/data/mirror-mouse-example")
RUNS = ("heatmap", "mhcrnn", "mhcrnn-repeat")
STALL_SECS = int(os.environ.get("MHCRNN_CTRL_STALL_SECS", "900"))
MAX_ATTEMPTS = 6


def adjacency_report() -> dict:
    """Measure whether index-adjacent labeled frames are temporal
    neighbors: mean |gray_n - gray_{n+1}| across the labeled set vs the
    same statistic for truly adjacent video frames."""
    import cv2

    ld = DATA_DIR / "labeled-data"
    names = sorted(os.listdir(ld))
    diffs = []
    prev = None
    for n in names[: min(len(names), 30)]:
        img = cv2.imread(str(ld / n), cv2.IMREAD_GRAYSCALE).astype(np.int32)
        if prev is not None:
            diffs.append(float(np.abs(img - prev).mean()))
        prev = img
    cap = cv2.VideoCapture(str(DATA_DIR / "videos" / "test_vid.mp4"))
    vdiffs = []
    prev = None
    for _ in range(10):
        ok, frame = cap.read()
        if not ok:
            break
        g = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.int32)
        if prev is not None:
            vdiffs.append(float(np.abs(g - prev).mean()))
        prev = g
    cap.release()
    return {
        "labeled_adjacent_mean_absdiff": float(np.mean(diffs)),
        "video_adjacent_mean_absdiff": float(np.mean(vdiffs)),
        "labeled_over_video_ratio": float(np.mean(diffs) / np.mean(vdiffs)),
    }


def overrides(name: str, epochs: int) -> list[str]:
    model_type = "heatmap" if name == "heatmap" else "heatmap_mhcrnn"
    resize = int(os.environ.get("MHCRNN_CTRL_RESIZE", "256"))
    backbone = os.environ.get("MHCRNN_CTRL_BACKBONE", "resnet50")
    return [
        f"data.data_dir={DATA_DIR}",
        f"data.video_dir={DATA_DIR}/videos",
        "data.num_keypoints=17",
        f"data.image_resize_dims.height={resize}",
        f"data.image_resize_dims.width={resize}",
        "training.train_prob=0.8",
        "training.val_prob=0.1",
        f"training.max_epochs={epochs}",
        f"training.min_epochs={epochs}",
        "training.lr_scheduler_params.multisteplr.milestones="
        f"[{epochs // 2},{epochs * 3 // 4}]",
        f"training.check_val_every_n_epoch={max(1, min(20, epochs // 5))}",
        "training.unfreezing_epoch=0",
        "training.train_batch_size=8",
        f"model.backbone={backbone}",
        f"model.model_type={model_type}",
        f"model.model_name={name}",
        "eval.predict_vids_after_training=false",
    ] + (
        # the product knob this harness motivated (data/datasets.py
        # _load_context): stack 5 copies of the center frame instead of
        # index-adjacent files
        ["model.mhcrnn_context_mode=repeat_center"]
        if name == "mhcrnn-repeat"
        else []
    )


def _force_cpu_if_requested() -> None:
    if os.environ.get("MHCRNN_CTRL_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")


def _train_child(name: str, model_dir: Path, resume: bool) -> None:
    import jax

    _force_cpu_if_requested()
    jax.config.update("jax_compilation_cache_dir", "/tmp/lp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from lightning_pose_tpu.config import load_config
    from lightning_pose_tpu.train import train

    epochs = int(os.environ.get("MHCRNN_CTRL_EPOCHS", "100"))
    cfg = load_config()
    cfg.apply_overrides(
        overrides(name, epochs) + (["training.resume=true"] if resume else [])
    )
    train(cfg, model_dir=model_dir, skip_evaluation=True)


def _train_complete(model_dir: Path) -> bool:
    status = model_dir / "train_status.json"
    if not status.exists():
        return False
    try:
        return json.loads(status.read_text()).get("status") == "COMPLETED"
    except (json.JSONDecodeError, OSError):
        return False


def _newest_mtime(out_dir: Path) -> float:
    newest = 0.0
    if out_dir.exists():
        for p in out_dir.rglob("*"):
            try:
                newest = max(newest, p.stat().st_mtime)
            except OSError:
                pass
    return newest


def _train_watched(name: str, out_root: Path, model_dir: Path) -> None:
    import subprocess
    import time

    for attempt in range(MAX_ATTEMPTS):
        cmd = [sys.executable, os.path.abspath(__file__), str(out_root),
               "--child-train", name]
        if attempt > 0:
            cmd.append("--resume")
        proc = subprocess.Popen(cmd)
        start = time.time()
        while proc.poll() is None:
            time.sleep(30)
            last = max(_newest_mtime(model_dir), start)
            if time.time() - last > STALL_SECS:
                print(f"[watchdog] {name} attempt {attempt + 1}: no progress "
                      f"for {STALL_SECS}s — killing (tunnel hang?)", flush=True)
                proc.kill()
                proc.wait()
                break
        if proc.returncode == 0:
            return
        time.sleep(30)
    raise SystemExit(f"{name}: training failed after {MAX_ATTEMPTS} attempts")


def _split_series(model_dir: Path, n: int) -> pd.Series:
    """Per-frame split labels from the run's own predictions.csv set column."""
    preds = pd.read_csv(model_dir / "predictions.csv", header=[0, 1, 2],
                        index_col=0)
    sets = preds.loc[:, preds.columns.get_level_values(0) == "set"].iloc[:, 0]
    assert len(sets) == n
    return pd.Series(sets.to_numpy(), index=np.arange(n))


def _per_head_eval(name: str, model_dir: Path) -> pd.DataFrame:
    """Decode SF / MF heads separately on the labeled set; report pixel
    error by split for each head, the merged decode, and the MF win rate
    (fraction of keypoints where conf_mf >= conf_sf)."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.api.model import Model
    from lightning_pose_tpu.data import bboxes as bboxes_mod
    from lightning_pose_tpu.data.factory import get_dataset
    from lightning_pose_tpu.models.heatmap_tracker_mhcrnn import (
        merge_heads_by_confidence,
    )
    from lightning_pose_tpu.ops.preprocess import normalize_images

    m = Model.from_dir(model_dir)
    m._load()
    cfg, module, state = m.config.cfg, m._module, m._state
    dataset = get_dataset(cfg, str(DATA_DIR))
    size = int(cfg.data.image_resize_dims.height)
    n = len(dataset)

    @jax.jit
    def heads(vs, stacks, bbox):
        images = normalize_images(stacks.astype(jnp.float32))
        hm_sf, hm_mf = module.apply(vs, images, train=False)
        kp_sf, conf_sf = module.decode(hm_sf, fast=True)
        kp_mf, conf_mf = module.decode(hm_mf, fast=True)
        kp_merged, _ = merge_heads_by_confidence(kp_sf, conf_sf, kp_mf, conf_mf)
        out = []
        for kp in (kp_sf, kp_mf, kp_merged):
            out.append(bboxes_mod.model_to_frame_batch(
                kp.reshape(kp.shape[0], -1), bbox, size, size))
        return out[0], out[1], out[2], conf_sf, conf_mf

    vs = {"params": state.params, "batch_stats": state.batch_stats}
    rows_sf, rows_mf, rows_merged, mf_wins = [], [], [], []
    bs = 10
    for i0 in range(0, n, bs):
        samples = [dataset[i] for i in range(i0, min(i0 + bs, n))]
        stacks = jnp.asarray(np.stack([s["images"] for s in samples]))
        bbox = jnp.asarray(np.stack([s["bbox"] for s in samples]))
        kp_sf, kp_mf, kp_merged, c_sf, c_mf = heads(vs, stacks, bbox)
        rows_sf.append(np.asarray(kp_sf))
        rows_mf.append(np.asarray(kp_mf))
        rows_merged.append(np.asarray(kp_merged))
        mf_wins.append(np.asarray(c_mf) >= np.asarray(c_sf))
    preds = {k: np.concatenate(v).reshape(n, -1, 2) for k, v in
             (("sf", rows_sf), ("mf", rows_mf), ("merged", rows_merged))}
    mf_win = np.concatenate(mf_wins)  # (n, K)

    labels = pd.read_csv(DATA_DIR / "CollectedData.csv", header=[0, 1, 2],
                         index_col=0)
    gt = labels.loc[:, labels.columns.get_level_values("coords").isin(
        ["x", "y"])].to_numpy(float).reshape(n, -1, 2)
    sets = _split_series(model_dir, n)

    out = {}
    for head, kp in preds.items():
        err = np.sqrt(((kp - gt) ** 2).sum(-1))  # (n, K)
        per_frame = pd.Series(np.nanmean(err, axis=1))
        out[f"{head}_px"] = per_frame.groupby(sets.to_numpy()).mean()
    out["mf_win_rate"] = pd.Series(mf_win.mean(axis=1)).groupby(
        sets.to_numpy()).mean()
    return pd.DataFrame(out)


def _final_eval(name: str, model_dir: Path) -> pd.Series:
    """Product-path pixel error by split (predictions_pixel_error.csv)."""
    err = pd.read_csv(model_dir / "predictions_pixel_error.csv", index_col=0)
    return err.groupby("set").mean(numeric_only=True).mean(axis=1)


def _predict_labels(name: str, model_dir: Path) -> None:
    """Produce predictions.csv + pixel-error CSV for a run trained with
    skip_evaluation (watchdog runs skip it to keep steps cheap)."""
    if (model_dir / "predictions_pixel_error.csv").exists():
        return
    _force_cpu_if_requested()
    from lightning_pose_tpu.api.model import Model

    m = Model.from_dir(model_dir)
    m.predict_on_label_csv(
        csv_file=str(DATA_DIR / "CollectedData.csv"),
        compute_metrics=True,
        add_train_val_test_set=True,
        output_dir=model_dir,
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_root = Path(args[0] if args else "outputs/mhcrnn_controlled").resolve()

    if "--child-train" in sys.argv:
        name = sys.argv[sys.argv.index("--child-train") + 1]
        _train_child(name, out_root / name, resume="--resume" in sys.argv)
        return

    runs = list(RUNS)
    if "--only" in sys.argv:
        runs = [sys.argv[sys.argv.index("--only") + 1]]

    adj = adjacency_report()
    print("context adjacency:", json.dumps(adj, indent=None), flush=True)

    results = {}
    for name in runs:
        model_dir = out_root / name
        if not _train_complete(model_dir):
            print(f"\n=== training {name} ===", flush=True)
            _train_watched(name, out_root, model_dir)
        _predict_labels(name, model_dir)
        results[name] = _final_eval(name, model_dir)
        print(f"{name}: {results[name].round(3).to_dict()}", flush=True)

    table = pd.DataFrame(results)
    print("\n=== controlled comparison: pixel error by split (original px) ===")
    print(table.round(3).to_string())
    table.to_csv(out_root / "controlled_comparison.csv")

    for name in runs:
        if not name.startswith("mhcrnn"):
            continue
        ph = _per_head_eval(name, out_root / name)
        print(f"\n=== {name}: per-head breakdown ===")
        print(ph.round(3).to_string())
        ph.to_csv(out_root / name / "per_head_breakdown.csv")

    (out_root / "adjacency.json").write_text(json.dumps(adj, indent=2))


if __name__ == "__main__":
    main()
