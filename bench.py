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

if os.environ.get("LP_BENCH_CPU"):
    # dev-smoke knob: the axon TPU plugin overrides the JAX_PLATFORMS env
    # var, so only the in-process config update reliably forces CPU here
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

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


def _make_mv_assets(tmp: str) -> tuple[str, list[str]]:
    """Split mirror-mouse into a 2-view project (top/bot at y=168, the
    reference's mirror-mouse-separate layout) and build a loadable
    multiview model dir. Returns (model_dir, [video_top, video_bot])."""
    import cv2
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.config import load_config
    from lightning_pose_tpu.models.factory import get_model
    from lightning_pose_tpu.train import checkpoints as ckpt_utils

    y_split = 168
    cap = cv2.VideoCapture(VIDEO)
    fps = cap.get(cv2.CAP_PROP_FPS)
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    four = cv2.VideoWriter_fourcc(*"mp4v")
    vid_dir = Path(tmp) / "videos"
    vid_dir.mkdir(parents=True, exist_ok=True)
    writers = [
        cv2.VideoWriter(str(vid_dir / "test_vid_top.mp4"), four, fps,
                        (w, y_split)),
        cv2.VideoWriter(str(vid_dir / "test_vid_bot.mp4"), four, fps,
                        (w, h - y_split)),
    ]
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        writers[0].write(frame[:y_split])
        writers[1].write(frame[y_split:])
    cap.release()
    for wr in writers:
        wr.release()
    vids = [str(vid_dir / "test_vid_top.mp4"),
            str(vid_dir / "test_vid_bot.mp4")]

    n_kp = 7
    cfg = load_config()
    cfg.data.data_dir = tmp
    cfg.data.video_dir = str(vid_dir)
    cfg.data.csv_file = ["top.csv", "bot.csv"]
    cfg.data.view_names = ["top", "bot"]
    cfg.data.num_keypoints = n_kp
    cfg.data.keypoint_names = [f"kp{i}" for i in range(n_kp)]
    cfg.data.mirrored_column_matches = None
    cfg.data.columns_for_singleview_pca = None
    cfg.data.image_resize_dims.height = SIZE
    cfg.data.image_resize_dims.width = SIZE
    cfg.model.model_type = "heatmap"
    cfg.model.backbone = "resnet50"
    cfg.model.model_name = "bench-mv"
    cfg.dali.base.predict.sequence_length = SEQ_LEN

    module, _meta = get_model(cfg)
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, SIZE, SIZE, 3), dtype=jnp.float32)
    variables = module.init(rng, dummy, train=False)
    model_dir = Path(tmp) / "model"
    version_dir = Path(ckpt_utils.next_version_dir(str(model_dir), "bench-mv"))
    ckpt_dir = ckpt_utils.checkpoint_dir(str(version_dir))
    ckpt_utils.save_checkpoint(
        str(Path(ckpt_dir) / "epoch=0-step=0-best.ckpt"),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        step=0,
        epoch=0,
    )
    cfg.save(str(model_dir / "config.yaml"))
    return str(model_dir), vids


def bench_mv() -> dict:
    """2-view product-path inference: Model.predict_on_video_file_multiview
    on a top/bot split of the mirror-mouse test video (the reference's
    multiview 2-view benchmark, mixed_precision.rst:294-298 — T4 FP32
    330.2 s for 2x469 frames = 2.84 fps)."""
    from lightning_pose_tpu.api.model import Model
    from lightning_pose_tpu.data.video import count_frames

    n_frames = count_frames(VIDEO)
    tmp = tempfile.mkdtemp(prefix="lp_bench_mv_")
    try:
        model_dir, vids = _make_mv_assets(tmp)
        m = Model.from_dir(model_dir)
        m.predict_on_video_file_multiview(vids)  # warmup: compile + codec
        elapsed = float("inf")
        for _ in range(2):
            t0 = time.time()
            result = m.predict_on_video_file_multiview(vids)
            elapsed = min(elapsed, time.time() - t0)
            assert len(result.predictions) == 2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    total = 2 * n_frames
    return {"fps": total / elapsed, "frames": total, "sec": elapsed}


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


def _device_peak_flops() -> float:
    """Nominal bf16 peak of the attached accelerator for MFU estimates.
    TPU v5e: 197 TFLOP/s bf16 (public spec). Unknown devices fall back to
    the v5e number (the target platform)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind or "v5litepod" in kind:
        return 197e12
    if "v4" in kind:
        return 275e12
    if "v6" in kind or "trillium" in kind:
        return 918e12
    return 197e12


def _compiled_flops(compiled) -> float | None:
    """Total FLOPs of a compiled XLA program via cost analysis (None when
    the backend doesn't expose it)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def bench_device(backbone: str = "resnet50") -> dict:
    """Device-resident steady-state inference: preload N video batches to
    HBM, run ONE jitted lax.scan program over all of them, sync via
    np.asarray. No per-batch transfer or dispatch in the timed region —
    this is the rig-independent device-compute number (+ MFU estimate).

    ``backbone`` selects the trunk: resnet50 (headline) or vits_dinov2
    (the reference's ViT-S forward-pass rows, mixed_precision.rst:221-224)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightning_pose_tpu.data import bboxes as bboxes_mod
    from lightning_pose_tpu.data.video import PredictVideoLoader
    from lightning_pose_tpu.models.heatmap_tracker import HeatmapTracker
    from lightning_pose_tpu.ops.preprocess import normalize_images

    n_batches = 8
    model = HeatmapTracker(
        backbone_arch=backbone, num_keypoints=17, image_size=SIZE,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((SEQ_LEN, SIZE, SIZE, 3), dtype=jnp.float32)
    variables = model.init(rng, dummy, train=False)

    loader = PredictVideoLoader(
        VIDEO, sequence_length=SEQ_LEN, resize_height=SIZE, resize_width=SIZE
    )
    host_batches = []
    for b in loader:
        host_batches.append(b)
        if len(host_batches) >= n_batches:
            break
    stacked = np.stack(host_batches)  # (N, T, H, W, 3) uint8
    bbox = jnp.tile(jnp.asarray([0.0, 0.0, 406.0, 396.0]), (SEQ_LEN, 1))

    @jax.jit
    def run_all(variables, frames_all, bbox):
        def body(carry, frames):
            images = normalize_images(frames.astype(jnp.float32))
            heatmaps = model.apply(variables, images, train=False)
            preds, confs = model.decode(heatmaps, fast=True)
            preds = bboxes_mod.model_to_frame_batch(preds, bbox, SIZE, SIZE)
            return carry, (preds, confs)

        _, outs = jax.lax.scan(body, 0, frames_all)
        return outs

    frames_dev = jax.device_put(jnp.asarray(stacked))
    # warmup (compile) + one throwaway execution
    kp, conf = run_all(variables, frames_dev, bbox)
    np.asarray(kp)

    elapsed = float("inf")
    for _ in range(3):
        t0 = time.time()
        kp, conf = run_all(variables, frames_dev, bbox)
        np.asarray(kp), np.asarray(conf)  # host sync
        elapsed = min(elapsed, time.time() - t0)

    n_frames = n_batches * SEQ_LEN
    fps = n_frames / elapsed

    # XLA cost analysis counts a lax.scan body ONCE (trip count is opaque
    # to HloCostAnalysis), so measure the single-batch program and scale
    # by the number of scanned batches
    @jax.jit
    def run_one(variables, frames, bbox):
        images = normalize_images(frames.astype(jnp.float32))
        heatmaps = model.apply(variables, images, train=False)
        preds, confs = model.decode(heatmaps, fast=True)
        return bboxes_mod.model_to_frame_batch(preds, bbox, SIZE, SIZE), confs

    flops_one = _compiled_flops(
        run_one.lower(variables, frames_dev[0], bbox).compile()
    )
    mfu = None
    if flops_one:
        mfu = (flops_one * n_batches / elapsed) / _device_peak_flops() * 100.0
    return {"fps": fps, "frames": n_frames, "sec": elapsed, "mfu_pct": mfu}


def bench_train() -> dict:
    """Device-resident training throughput (BASELINE row 1's counterpart):
    ResNet-50 heatmap, batch 16, 256px, dlc augmentation on device, data in
    an HBM cache. Times the scanned-epoch program (one dispatch for all
    steps, so per-RPC overhead is amortized out) -> steps/sec + MFU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightning_pose_tpu.config import load_config
    from lightning_pose_tpu.losses.factory import LossFactory
    from lightning_pose_tpu.models.heatmap_tracker import HeatmapTracker
    from lightning_pose_tpu.ops.augment import AugmentationEngine
    from lightning_pose_tpu.train.trainer import (
        TrainState,
        make_optimizer,
        make_step_fns,
    )

    bs = 16
    n_cache = 64
    # two scan lengths: the difference isolates the steady-state per-step
    # time from the tunnel's fixed per-dispatch cost (~30-60 ms RPC +
    # donation round-trip), which at 15 steps inflates ms/step by 2-4 ms
    n_steps = 15
    n_steps_long = 60
    num_keypoints = 17

    cfg = load_config()
    cfg.data.image_resize_dims.height = SIZE
    cfg.data.image_resize_dims.width = SIZE
    cfg.data.num_keypoints = num_keypoints
    cfg.training.train_batch_size = bs
    cfg.training.imgaug = "dlc"

    model = HeatmapTracker(
        backbone_arch="resnet50", num_keypoints=num_keypoints,
        image_size=SIZE, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        rng, jnp.zeros((bs, SIZE, SIZE, 3), dtype=jnp.float32), train=False
    )
    tx, _, _ = make_optimizer(cfg, 100, variables["params"])
    state = TrainState(
        step=jnp.asarray(0, dtype=jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    loss_factories = {
        "supervised": LossFactory({"heatmap_mse": {"log_weight": 0.0}}),
        "unsupervised": LossFactory({}),
    }
    augmenter = AugmentationEngine(
        pipeline="dlc", image_height=SIZE, image_width=SIZE
    )
    meta = {
        "model_type": "heatmap",
        "semi_supervised": False,
        "downsample_factor": 2,
        "num_keypoints": num_keypoints,
        "image_size": SIZE,
    }
    *_, train_step_cached, train_epoch_cached = make_step_fns(
        model, meta, loss_factories, augmenter, cfg, tx, 100
    )

    np_rng = np.random.default_rng(0)
    cache = {
        "images": jax.device_put(
            np_rng.integers(0, 255, (n_cache, SIZE, SIZE, 3)).astype(np.uint8)
        ),
        "keypoints": jax.device_put(
            np_rng.uniform(20, SIZE - 20, (n_cache, num_keypoints, 2)).astype(
                np.float32
            )
        ),
        "visibility": jax.device_put(
            np.full((n_cache, num_keypoints), 2, dtype=np.int64)
        ),
        "bbox": jax.device_put(
            np.tile(
                np.asarray([0.0, 0.0, 406.0, 396.0], dtype=np.float32),
                (n_cache, 1),
            )
        ),
    }
    idxs_all = np_rng.integers(0, n_cache, (n_steps_long, bs)).astype(np.int32)
    valid_all = np.ones((n_steps_long, bs), dtype=bool)
    step_rng = jax.random.PRNGKey(1)
    idxs_short = jax.device_put(idxs_all[:n_steps])
    valid_short = jax.device_put(valid_all[:n_steps])

    # XLA cost analysis counts the lax.scan body once, so take the FLOPs
    # of ONE cached train step and scale by the scan length
    flops_step = _compiled_flops(
        train_step_cached.lower(
            state, cache, idxs_short[0], valid_short[0], step_rng, {}
        ).compile()
    )

    def run_scan(state, idxs, valid):
        """best-of-2 timed executions of one scanned program."""
        state, logs = train_epoch_cached(  # warmup: compile + first run
            state, cache, idxs, valid, step_rng, {}
        )
        np.asarray(logs["total_loss"])
        n = int(idxs.shape[0])
        elapsed = float("inf")
        for _ in range(2):
            t0 = time.time()
            state, logs = train_epoch_cached(
                state, cache, idxs, valid, step_rng, {}
            )
            losses = np.asarray(logs["total_loss"])  # host sync
            t1 = time.time()
            assert losses.shape == (n,) and np.isfinite(losses).all()
            elapsed = min(elapsed, t1 - t0)
        return state, elapsed

    state, t_short = run_scan(state, idxs_short, valid_short)
    # salvage line: if the long-scan program (or its compile) dies to a
    # tunnel hang, the watchdog recovers this dispatch-inclusive short-scan
    # number from the killed child's partial stdout
    print(json.dumps(_fmt_train(_short_scan_result(
        n_steps, t_short, flops_step
    ))), flush=True)
    state, t_long = run_scan(
        state, jax.device_put(idxs_all), jax.device_put(valid_all)
    )

    # two-point fit: steady-state step time = slope between the two scan
    # lengths; the intercept is the fixed dispatch cost (tunnel RPC +
    # donation round-trip), which is a rig artifact, not framework cost
    d_steps = n_steps_long - n_steps
    steady_sec_per_step = (t_long - t_short) / d_steps
    if steady_sec_per_step <= 0:  # tunnel noise swamped the fit
        steady_sec_per_step = t_long / n_steps_long
    dispatch_ms = max(0.0, (t_short - n_steps * steady_sec_per_step) * 1000)
    steps_per_sec = 1.0 / steady_sec_per_step
    mfu = None
    if flops_step:
        mfu = (
            flops_step / steady_sec_per_step
        ) / _device_peak_flops() * 100.0
    # BASELINE row 1: ~20 min for ~200 labeled frames on a T4 — the
    # reference default trains 300 epochs x ceil(160/16)=10 steps = 3000
    # steps in ~1200 s => ~2.5 steps/s equivalent
    t4_steps_per_sec = 3000 / 1200.0
    return {
        "steps_per_sec": steps_per_sec,
        "ms_per_step": 1000.0 * steady_sec_per_step,
        "sec": t_long,
        "dispatch_overhead_ms": dispatch_ms,
        "steps_per_sec_incl_dispatch": n_steps_long / t_long,
        "mfu_pct": mfu,
        "vs_t4_train": steps_per_sec / t4_steps_per_sec,
    }


def bench_train_semisup() -> dict:
    """Semi-supervised training throughput — the framework's headline mode
    (BASELINE row 1's configs are run semi-supervised in practice; reference
    hot loop: reference models/base.py:576-665). ResNet-50 heatmap +
    pca_singleview + temporal unsupervised losses over a REAL unlabeled
    window stream from the mirror-mouse test video (YUV 4:2:0 transfer on
    TPU), scanned semisup epochs, bs16/256px.

    Reports:
      - steps/sec + MFU with the epoch's unlabeled windows already resident
        in HBM (the steady state of the scanned-epoch pipeline, where the
        host decodes epoch t+1 while epoch t executes),
      - the measured host->device transfer cost of one epoch's unlabeled
        stack (``unlabeled_transfer_ms_per_step``) so the non-overlapped
        worst case is visible too.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightning_pose_tpu.config import load_config
    from lightning_pose_tpu.data.factory import get_data_module, get_dataset
    from lightning_pose_tpu.losses.factory import get_loss_factories
    from lightning_pose_tpu.models.heatmap_tracker import HeatmapTracker
    from lightning_pose_tpu.ops.augment import AugmentationEngine
    from lightning_pose_tpu.train.trainer import (
        TrainState,
        make_optimizer,
        make_step_fns,
    )

    # LP_BENCH_SMOKE shrinks everything for CPU plumbing tests
    smoke = bool(os.environ.get("LP_BENCH_SMOKE"))
    size = 128 if smoke else SIZE
    backbone = "resnet18" if smoke else "resnet50"
    bs = 2 if smoke else 16
    n_cache = 8 if smoke else 64
    n_steps = 2 if smoke else 15
    # second scan length for the two-point dispatch-overhead fit (see
    # bench_train); 40 keeps the unlabeled-stack transfer bounded
    n_steps_long = 3 if smoke else 40
    num_keypoints = 17

    cfg = load_config()
    cfg.data.data_dir = DATA_DIR
    cfg.data.video_dir = str(Path(DATA_DIR) / "videos")
    cfg.data.csv_file = "CollectedData.csv"
    cfg.data.num_keypoints = num_keypoints
    cfg.data.image_resize_dims.height = size
    cfg.data.image_resize_dims.width = size
    # mirror-mouse PCA setup (reference config_mirror-mouse-example.yaml:32-35)
    cfg.data.columns_for_singleview_pca = [0, 1, 2, 3, 4, 5, 6, 8, 9, 10,
                                           11, 12, 13, 14]
    cfg.training.train_batch_size = bs
    cfg.training.imgaug = "dlc"
    cfg.model.model_type = "heatmap"
    cfg.model.backbone = backbone
    cfg.model.losses_to_use = ["pca_singleview", "temporal"]

    # product factories: real dataset (PCA fit source) + real unlabeled
    # video stream (YUV 4:2:0 on TPU, RGB elsewhere)
    dataset = get_dataset(cfg, DATA_DIR)
    data_module = get_data_module(cfg, dataset, cfg.data.video_dir)
    loss_factories = get_loss_factories(cfg, data_module)

    model = HeatmapTracker(
        backbone_arch=backbone, num_keypoints=num_keypoints,
        image_size=size, dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        rng, jnp.zeros((bs, size, size, 3), dtype=jnp.float32), train=False
    )
    tx, _, _ = make_optimizer(cfg, 100, variables["params"])
    state = TrainState(
        step=jnp.asarray(0, dtype=jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    augmenter = AugmentationEngine(
        pipeline="dlc", image_height=size, image_width=size
    )
    meta = {
        "model_type": "heatmap",
        "semi_supervised": True,
        "downsample_factor": 2,
        "num_keypoints": num_keypoints,
        "image_size": size,
    }
    *_, train_step_cached, train_epoch_cached = make_step_fns(
        model, meta, loss_factories, augmenter, cfg, tx, 100
    )

    # same synthetic labeled cache as bench_train so the semisup delta is
    # attributable to the unlabeled stream + losses alone
    np_rng = np.random.default_rng(0)
    cache = {
        "images": jax.device_put(
            np_rng.integers(0, 255, (n_cache, size, size, 3)).astype(np.uint8)
        ),
        "keypoints": jax.device_put(
            np_rng.uniform(20, size - 20, (n_cache, num_keypoints, 2)).astype(
                np.float32
            )
        ),
        "visibility": jax.device_put(
            np.full((n_cache, num_keypoints), 2, dtype=np.int64)
        ),
        "bbox": jax.device_put(
            np.tile(
                np.asarray([0.0, 0.0, 406.0, 396.0], dtype=np.float32),
                (n_cache, 1),
            )
        ),
    }
    idxs_all = np_rng.integers(0, n_cache, (n_steps_long, bs)).astype(np.int32)
    valid_all = np.ones((n_steps_long, bs), dtype=bool)
    step_rng = jax.random.PRNGKey(1)

    # one epoch's unlabeled windows, stacked (steps, ...) — exactly what the
    # trainer's epoch-prefetch ships (trainer.py:1076-1089)
    windows = [
        next(data_module.unlabeled_loader) for _ in range(n_steps_long)
    ]
    unlabeled_host = {
        k: np.stack([np.asarray(w[k]) for w in windows]) for k in windows[0]
    }
    data_module.close()
    ul_bytes = sum(v.nbytes for v in unlabeled_host.values())

    # measured transfer cost of one epoch's unlabeled stack; best-of-2 —
    # a single tunnel RPC can stall for minutes (r05 run 1 recorded a
    # 249 s outlier for a ~47 MB stack) and one bad sample shouldn't be
    # recorded as the steady-state cost
    transfer_sec = float("inf")
    for _ in range(2):
        t0 = time.time()
        unlabeled_all = jax.device_put(unlabeled_host)
        np.asarray(jax.tree_util.tree_leaves(unlabeled_all)[0][0, 0])  # sync
        transfer_sec = min(transfer_sec, time.time() - t0)

    idxs_dev = jax.device_put(idxs_all)
    valid_dev = jax.device_put(valid_all)
    unlabeled_short = {k: v[:n_steps] for k, v in unlabeled_all.items()}
    flops_step = _compiled_flops(
        train_step_cached.lower(
            state, cache, idxs_dev[0], valid_dev[0], step_rng,
            {k: v[0] for k, v in unlabeled_all.items()},
        ).compile()
    )

    def run_scan(state, idxs, valid, ul):
        state, logs = train_epoch_cached(  # warmup: compile + first run
            state, cache, idxs, valid, step_rng, ul
        )
        np.asarray(logs["total_loss"])
        n = int(idxs.shape[0])
        elapsed = float("inf")
        for _ in range(2):
            t0 = time.time()
            state, logs = train_epoch_cached(
                state, cache, idxs, valid, step_rng, ul
            )
            losses = np.asarray(logs["total_loss"])  # host sync
            t1 = time.time()
            assert losses.shape == (n,) and np.isfinite(losses).all()
            assert np.isfinite(np.asarray(logs["train_unsupervised_loss"])).all()
            elapsed = min(elapsed, t1 - t0)
        return state, elapsed

    state, t_short = run_scan(
        state, idxs_dev[:n_steps], valid_dev[:n_steps], unlabeled_short
    )
    # salvage line (see bench_train): recoverable if the long scan dies
    print(json.dumps(_fmt_train_semisup(_short_scan_result(
        n_steps, t_short, flops_step,
        unlabeled_transfer_ms_per_step=1000.0 * transfer_sec / n_steps_long,
        unlabeled_mb_per_step=ul_bytes / n_steps_long / 1e6,
    ))), flush=True)
    state, t_long = run_scan(state, idxs_dev, valid_dev, unlabeled_all)

    # two-point fit (see bench_train): slope = steady-state step time,
    # intercept = fixed tunnel dispatch cost
    d_steps = n_steps_long - n_steps
    steady_sec_per_step = (t_long - t_short) / d_steps
    if steady_sec_per_step <= 0:
        steady_sec_per_step = t_long / n_steps_long
    dispatch_ms = max(0.0, (t_short - n_steps * steady_sec_per_step) * 1000)
    steps_per_sec = 1.0 / steady_sec_per_step
    mfu = None
    if flops_step:
        mfu = (
            flops_step / steady_sec_per_step
        ) / _device_peak_flops() * 100.0
    t4_steps_per_sec = 3000 / 1200.0  # see bench_train
    return {
        "steps_per_sec": steps_per_sec,
        "ms_per_step": 1000.0 * steady_sec_per_step,
        "sec": t_long,
        "dispatch_overhead_ms": dispatch_ms,
        "steps_per_sec_incl_dispatch": n_steps_long / t_long,
        "mfu_pct": mfu,
        "vs_t4_train": steps_per_sec / t4_steps_per_sec,
        "unlabeled_transfer_ms_per_step": 1000.0 * transfer_sec / n_steps_long,
        "unlabeled_mb_per_step": ul_bytes / n_steps_long / 1e6,
    }


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


def _run_measurement(mode: str) -> None:
    # persistent compilation cache: repeat invocations (and the retry
    # attempt) skip the ~40 s XLA compile
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/lp_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if mode == "raw":
        r = bench_raw()
        out = {
            "metric": "video_inference_fps_per_chip_resnet50_heatmap",
            "value": round(r["fps"], 2),
            "unit": "frames/sec",
            "vs_baseline": round(r["fps"] / T4_FPS_BASELINE, 2),
        }
    elif mode == "device":
        r = bench_device()
        out = {
            "metric": "device_resident_inference_fps_resnet50_heatmap",
            "value": round(r["fps"], 2),
            "unit": "frames/sec",
            "vs_baseline": round(r["fps"] / T4_FPS_BASELINE, 2),
            "mfu_pct": round(r["mfu_pct"], 2) if r["mfu_pct"] else None,
        }
    elif mode == "vit":
        r = bench_device(backbone="vits_dinov2")
        out = {
            "metric": "device_resident_inference_fps_vits_dinov2_heatmap",
            "value": round(r["fps"], 2),
            "unit": "frames/sec",
            # no published absolute ViT fps for the reference on T4; reuse
            # the resnet50 T4 product number as the common denominator
            "vs_baseline": round(r["fps"] / T4_FPS_BASELINE, 2),
            "mfu_pct": round(r["mfu_pct"], 2) if r["mfu_pct"] else None,
        }
    elif mode == "mv":
        r = bench_mv()
        out = {
            "metric": "video_inference_fps_multiview_2view_resnet50_heatmap",
            "value": round(r["fps"], 2),
            "unit": "frames/sec",
            # reference multiview 2-view T4 FP32: 330.2 s for 2x469 frames
            "vs_baseline": round(r["fps"] / (938 / 330.2), 2),
        }
    elif mode == "train":
        out = _fmt_train(bench_train())
    elif mode == "train-semisup":
        out = _fmt_train_semisup(bench_train_semisup())
    else:
        r = bench_product()
        out = {
            "metric": "video_inference_fps_product_path_resnet50_heatmap",
            "value": round(r["fps"], 2),
            "unit": "frames/sec",
            "vs_baseline": round(r["fps"] / T4_FPS_BASELINE, 2),
        }
    print(json.dumps(out))


def _short_scan_result(n_steps: int, t_short: float, flops_step,
                       **extra) -> dict:
    """Dispatch-inclusive result from the short scan alone — printed as a
    salvage line before the long scan runs (two-point fit pending)."""
    sps = n_steps / t_short
    r = {
        "steps_per_sec": sps,
        "ms_per_step": 1000.0 / sps,
        "sec": t_short,
        "dispatch_overhead_ms": 0.0,
        "steps_per_sec_incl_dispatch": sps,
        "mfu_pct": (
            (flops_step * n_steps / t_short) / _device_peak_flops() * 100.0
            if flops_step else None
        ),
        "vs_t4_train": sps / (3000 / 1200.0),
        "partial": True,
    }
    r.update(extra)
    return r


def _fmt_train(r: dict) -> dict:
    out = {
        "metric": "train_steps_per_sec_resnet50_heatmap_bs16",
        "value": round(r["steps_per_sec"], 3),
        "unit": "steps/sec",
        "vs_baseline": round(r["vs_t4_train"], 2),
        "ms_per_step": round(r["ms_per_step"], 1),
        "mfu_pct": round(r["mfu_pct"], 2) if r["mfu_pct"] else None,
        "dispatch_overhead_ms": round(r["dispatch_overhead_ms"], 1),
    }
    if r.get("partial"):
        out["partial"] = True
    return out


def _fmt_train_semisup(r: dict) -> dict:
    out = _fmt_train(r)
    out["metric"] = "train_semisup_steps_per_sec_resnet50_heatmap_bs16"
    out["unlabeled_transfer_ms_per_step"] = round(
        r["unlabeled_transfer_ms_per_step"], 1
    )
    out["unlabeled_mb_per_step"] = round(r["unlabeled_mb_per_step"], 2)
    return out


def _preflight(timeout: int = 240, retries: int = 3, wait_s: int = 120) -> bool:
    """Cheap device liveness check before committing to the long watchdog
    timeouts: init jax + one tiny matmul in a subprocess. The remote-device
    tunnel can hang indefinitely; without this a dead tunnel burns every
    mode's full timeout (~1.5 h) before the error JSON appears."""
    import subprocess

    code = (
        "import os, jax, numpy as np, jax.numpy as jnp;"
        "os.environ.get('LP_BENCH_CPU') and "
        "jax.config.update('jax_platforms', 'cpu');"
        "x = jnp.ones((128, 128), jnp.bfloat16);"
        "print('PREFLIGHT_OK', float(np.asarray(x @ x)[0, 0]))"
    )
    for attempt in range(retries):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=timeout,
            )
            if proc.returncode == 0 and "PREFLIGHT_OK" in proc.stdout:
                return True
            print(
                f"preflight attempt {attempt + 1}: rc={proc.returncode} "
                f"{proc.stderr[-300:]}", file=sys.stderr,
            )
        except subprocess.TimeoutExpired:
            print(
                f"preflight attempt {attempt + 1}: device init timed out "
                f"(tunnel hang?)", file=sys.stderr,
            )
        if attempt + 1 < retries:
            time.sleep(wait_s)  # tunnel hiccups are often transient
    return False


def _watchdog(
    mode: str, timeout: int, retries: int = 2, deadline: float | None = None
) -> dict | None:
    """Run one measurement in a subprocess with a timeout; retry on
    hang/failure (single tunnel RPCs can hang for minutes). ``deadline``
    (time.time() epoch) caps each attempt so the whole bench run stays
    inside the driver's window — an attempt that can't get at least 120 s
    is skipped rather than started doomed."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--child", f"--{mode}"]
    salvaged: dict | None = None
    for attempt in range(retries):
        attempt_timeout = timeout
        if deadline is not None:
            remaining = deadline - time.time()
            if remaining < 120:
                print(f"{mode}: skipped (budget exhausted)", file=sys.stderr)
                return salvaged
            attempt_timeout = min(timeout, int(remaining))
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=attempt_timeout
            )
        except subprocess.TimeoutExpired as e:
            # the measurement prints a salvage JSON line after its first
            # completed timing (e.g. the short scan). Stash it but keep
            # retrying: the persistent compile cache makes a retry likely
            # to finish the FULL (two-point-fit) measurement, which beats
            # recording the dispatch-inclusive partial methodology.
            partial = _last_json_line(e.stdout)
            if partial is not None:
                salvaged = partial
                print(
                    f"{mode} attempt {attempt + 1}: timed out; salvaged "
                    f"partial result (retrying for the full measurement)",
                    file=sys.stderr,
                )
            else:
                print(
                    f"{mode} attempt {attempt + 1}: timed out (tunnel hang?)",
                    file=sys.stderr,
                )
            continue
        result = _last_json_line(proc.stdout)
        if proc.returncode == 0 and result is not None:
            return result
        print(
            f"{mode} attempt {attempt + 1}: rc={proc.returncode} "
            f"{proc.stderr[-500:]}",
            file=sys.stderr,
        )
        if result is not None:  # crashed after printing a salvage line
            salvaged = result
    return salvaged


def _last_json_line(stdout) -> dict | None:
    if stdout is None:
        return None
    if isinstance(stdout, bytes):  # TimeoutExpired carries raw bytes
        stdout = stdout.decode(errors="replace")
    json_lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
    for ln in reversed(json_lines):  # last complete line wins
        try:
            return json.loads(ln)
        except json.JSONDecodeError:  # killed mid-write
            continue
    return None


def main() -> None:
    """Product-path fps (headline) + device-resident inference fps/MFU +
    training (supervised & semisup) steps/sec/MFU, each in its own watchdog
    subprocess. The merged JSON object is re-printed (flushed) after every
    completed mode — the LAST line is always the most complete result, and
    a driver kill mid-run preserves everything measured so far.

    --raw / --device / --train run a single measurement (still
    watchdogged); --child --<mode> is the in-process measurement."""
    for mode in ("raw", "device", "train-semisup", "train", "product", "mv",
                 "vit"):
        if f"--{mode}" in sys.argv:
            single = mode
            break
    else:
        single = None

    if "--child" in sys.argv:
        _run_measurement(single or "product")
        return

    # the scanned train program's / multiview predict's cold compile can
    # exceed 10 min through the tunnel — give those modes the same window
    # the full run allots
    mode_timeouts = {"train": 900, "mv": 900, "train-semisup": 900}

    if single is not None:
        if not _preflight(retries=2, wait_s=60):
            print(json.dumps({
                "metric": single, "value": 0.0, "unit": "",
                "vs_baseline": 0.0,
                "error": "device preflight failed: accelerator unreachable",
            }))
            return
        r = _watchdog(single, timeout=mode_timeouts.get(single, 600))
        print(json.dumps(r) if r else json.dumps({"metric": single, "value": 0.0,
              "unit": "", "vs_baseline": 0.0, "error": "measurement failed"}))
        return

    # global wall-clock budget: the driver kills bench.py at its own window
    # (round-4 postmortem: rc=124 with every completed measurement lost).
    # Keep the whole run comfortably inside it and emit the merged-so-far
    # JSON line after EVERY completed mode so a mid-run kill still leaves
    # the last printed line parseable with everything measured so far.
    budget_s = int(os.environ.get("LP_BENCH_BUDGET_S", "3300"))
    deadline = time.time() + budget_s

    if not _preflight(retries=2, wait_s=60):
        print(json.dumps({
            "metric": "video_inference_fps_product_path_resnet50_heatmap",
            "value": 0.0,
            "unit": "frames/sec",
            "vs_baseline": 0.0,
            "error": "device preflight failed: accelerator unreachable "
                     "(tunnel down?) after 2 attempts",
        }), flush=True)
        return

    out = {
        "metric": "video_inference_fps_product_path_resnet50_heatmap",
        "value": 0.0,
        "unit": "frames/sec",
        "vs_baseline": 0.0,
    }

    def merge(mode: str, r: dict | None) -> None:
        if r is None:
            return
        if mode == "product":
            out.update({"value": r["value"],
                        "vs_baseline": r["vs_baseline"]})
        elif mode == "device":
            out["device_resident_fps"] = r["value"]
            out["device_inference_mfu_pct"] = r.get("mfu_pct")
        elif mode == "train":
            out["train_steps_per_sec"] = r["value"]
            out["train_ms_per_step"] = r.get("ms_per_step")
            out["train_mfu_pct"] = r.get("mfu_pct")
            out["train_dispatch_overhead_ms"] = r.get("dispatch_overhead_ms")
            out["train_vs_t4_20min_baseline"] = r.get("vs_baseline")
        elif mode == "train-semisup":
            out["train_semisup_steps_per_sec"] = r["value"]
            out["train_semisup_ms_per_step"] = r.get("ms_per_step")
            out["train_semisup_mfu_pct"] = r.get("mfu_pct")
            out["train_semisup_unlabeled_transfer_ms_per_step"] = (
                r.get("unlabeled_transfer_ms_per_step")
            )
            out["train_semisup_unlabeled_mb_per_step"] = (
                r.get("unlabeled_mb_per_step")
            )
        elif mode == "mv":
            out["multiview_2view_fps"] = r["value"]
            out["multiview_vs_t4_baseline"] = r.get("vs_baseline")
        elif mode == "vit":
            out["vit_device_fps"] = r["value"]
            out["vit_device_mfu_pct"] = r.get("mfu_pct")
        if r.get("partial"):
            out[mode.replace("-", "_") + "_partial"] = True

    # highest-value measurements first (headline product fps, then the two
    # training numbers); once any mode times out through all its retries,
    # drop remaining modes to a single attempt (degraded tunnel)
    plan = [
        ("product", 600, 2),
        ("train", 900, 2),
        ("train-semisup", 900, 2),
        ("device", 480, 2),
        ("mv", 900, 1),
        ("vit", 480, 1),
    ]
    degraded = False
    for mode, timeout, retries in plan:
        if degraded:
            retries = 1
        r = _watchdog(mode, timeout=timeout, retries=retries,
                      deadline=deadline)
        if r is None:
            degraded = True
            if out["value"] == 0.0 and mode == "product":
                out["error"] = "product measurement failed"
        elif r.get("partial"):
            # exhausted retries and only the salvage line landed — the
            # tunnel is struggling; don't burn full retries on later modes
            degraded = True
        merge(mode, r)
        # flush the merged-so-far line: if the driver kills us after this
        # point, the tail's last JSON line still carries this measurement
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
