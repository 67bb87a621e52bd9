"""Device-side decomposition of the semi-supervised training step.

The round-5 bench recorded the first semisup number (24.4 steps/s,
41.0 ms/step @ 19.0% MFU vs the supervised step's 14.0 ms) but not where
the extra 27 ms goes. This script times the slices on the real device
(reference hot loop: reference models/base.py:576-665):

  semisup full      — scanned epoch, unlabeled resident (the bench number)
  supervised only   — same labeled cache, losses_to_use=[]
  ul decode+aug     — i420->RGB + DALI-equivalent video aug + normalize
  ul forward        — ResNet-50 fwd + soft-argmax decode on the window (no grad)
  ul loss math      — pca_singleview + temporal on fixed keypoints

plus the host->device transfer floor implied by the window's bytes at the
measured tunnel bandwidth. Everything scans N_SCAN applications per
dispatch so the ~30-50 ms RPC amortizes away.

    python scripts/profile_semisup.py
"""

import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/lp_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("SEMISUP_PROF_CPU"):
    # the axon TPU plugin overrides the JAX_PLATFORMS env var; only the
    # in-process config update reliably forces CPU on this rig
    jax.config.update("jax_platforms", "cpu")

from lightning_pose_tpu.config import load_config  # noqa: E402
from lightning_pose_tpu.data.factory import (  # noqa: E402
    get_data_module,
    get_dataset,
)
from lightning_pose_tpu.losses.factory import get_loss_factories  # noqa: E402
from lightning_pose_tpu.models.heatmap_tracker import HeatmapTracker  # noqa: E402
from lightning_pose_tpu.ops.augment import AugmentationEngine  # noqa: E402
from lightning_pose_tpu.train.trainer import (  # noqa: E402
    TrainState,
    make_optimizer,
    make_step_fns,
)

DATA_DIR = "/root/reference/data/mirror-mouse-example"
SIZE = int(os.environ.get("SEMISUP_PROF_RESIZE", "256"))
BS = int(os.environ.get("SEMISUP_PROF_BS", "16"))
BACKBONE = os.environ.get("SEMISUP_PROF_BACKBONE", "resnet50")
N_SCAN = int(os.environ.get("SEMISUP_PROF_SCAN", "15"))
K = 17


def base_cfg(losses):
    cfg = load_config()
    cfg.data.data_dir = DATA_DIR
    cfg.data.video_dir = str(Path(DATA_DIR) / "videos")
    cfg.data.csv_file = "CollectedData.csv"
    cfg.data.num_keypoints = K
    cfg.data.image_resize_dims.height = SIZE
    cfg.data.image_resize_dims.width = SIZE
    cfg.data.columns_for_singleview_pca = [0, 1, 2, 3, 4, 5, 6, 8, 9, 10,
                                           11, 12, 13, 14]
    cfg.training.train_batch_size = BS
    cfg.training.imgaug = "dlc"
    cfg.model.model_type = "heatmap"
    cfg.model.backbone = BACKBONE
    cfg.model.losses_to_use = losses
    return cfg


def build_epoch_fn(losses):
    cfg = base_cfg(losses)
    dataset = get_dataset(cfg, DATA_DIR)
    data_module = get_data_module(cfg, dataset, cfg.data.video_dir)
    loss_factories = get_loss_factories(cfg, data_module)
    model = HeatmapTracker(
        backbone_arch=BACKBONE, num_keypoints=K, image_size=SIZE,
        dtype=jnp.bfloat16,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((BS, SIZE, SIZE, 3), dtype=jnp.float32), train=False,
    )
    tx, _, _ = make_optimizer(cfg, 100, variables["params"])
    # the epoch program donates the whole TrainState; build it from copies
    # so `variables` stays live for the fwd-only profile slice
    state = TrainState(
        step=jnp.asarray(0, dtype=jnp.int32),
        params=jax.tree_util.tree_map(jnp.copy, variables["params"]),
        batch_stats=jax.tree_util.tree_map(
            jnp.copy, variables.get("batch_stats", {})
        ),
        opt_state=tx.init(variables["params"]),
    )
    augmenter = AugmentationEngine("dlc", SIZE, SIZE)
    meta = {
        "model_type": "heatmap", "semi_supervised": bool(losses),
        "downsample_factor": 2, "num_keypoints": K, "image_size": SIZE,
    }
    *_, _, epoch_fn = make_step_fns(
        model, meta, loss_factories, augmenter, cfg, tx, 100
    )
    return epoch_fn, state, data_module, loss_factories, model, variables


def timed(label, fn, *args, n=N_SCAN):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + sync
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.time() - t0)
    ms = best / n * 1000
    print(f"{label:42s} {ms:8.2f} ms/step", flush=True)
    return ms


def main():
    print(f"devices: {jax.devices()}", flush=True)
    np_rng = np.random.default_rng(0)
    n_cache = 64
    cache = {
        "images": jax.device_put(np_rng.integers(
            0, 255, (n_cache, SIZE, SIZE, 3)).astype(np.uint8)),
        "keypoints": jax.device_put(np_rng.uniform(
            20, SIZE - 20, (n_cache, K, 2)).astype(np.float32)),
        "visibility": jax.device_put(np.full((n_cache, K), 2, np.int64)),
        "bbox": jax.device_put(np.tile(np.asarray(
            [0.0, 0.0, 406.0, 396.0], np.float32), (n_cache, 1))),
    }
    idxs = jax.device_put(
        np_rng.integers(0, n_cache, (N_SCAN, BS)).astype(np.int32))
    valid = jax.device_put(np.ones((N_SCAN, BS), bool))
    rng = jax.random.PRNGKey(1)

    # --- full semisup epoch (the bench program) ---
    epoch_ss, state_ss, dm, loss_factories, model, variables = build_epoch_fn(
        ["pca_singleview", "temporal"])
    windows = [next(dm.unlabeled_loader) for _ in range(N_SCAN)]
    unlabeled = jax.device_put({
        k: np.stack([np.asarray(w[k]) for w in windows]) for k in windows[0]
    })
    dm.close()
    mb_step = sum(
        v.nbytes for v in jax.tree_util.tree_leaves(unlabeled)
    ) / N_SCAN / 1e6
    # state is donated by the epoch program: rebind it through each call
    st = {"v": state_ss}

    def run_ss():
        st["v"], logs = epoch_ss(st["v"], cache, idxs, valid, rng, unlabeled)
        return logs["total_loss"]

    ms_ss = timed("semisup full (scan, unlabeled resident)", run_ss)

    # --- supervised-only epoch, same labeled protocol ---
    epoch_sup, state_sup, dm2, *_ = build_epoch_fn([])
    if hasattr(dm2, "close"):
        dm2.close()
    st_sup = {"v": state_sup}

    def run_sup():
        st_sup["v"], logs = epoch_sup(st_sup["v"], cache, idxs, valid, rng, {})
        return logs["total_loss"]

    ms_sup = timed("supervised only (same cache)", run_sup)

    # --- unlabeled slices, scanned standalone ---
    from lightning_pose_tpu.ops.preprocess import normalize_images
    from lightning_pose_tpu.ops.video_augment import augment_video_sequence

    frames0 = unlabeled["frames"][0]
    is_i420 = frames0.ndim == 3

    def ul_decode_aug(key, frames):
        x = frames
        if is_i420:
            from lightning_pose_tpu.ops.yuv import i420_to_rgb
            x = i420_to_rgb(x)
        f, t = augment_video_sequence(key, x, apply_geometric=True)
        return jnp.mean(normalize_images(f)) + jnp.mean(t)

    @jax.jit
    def scan_decode_aug(key, frames_all):
        def body(c, xs):
            k, fr = xs
            return c + ul_decode_aug(k, fr), 0
        tot, _ = jax.lax.scan(
            body, 0.0, (jax.random.split(key, N_SCAN),
                        frames_all))
        return tot
    timed("ul i420->rgb + video aug + normalize",
          lambda: scan_decode_aug(rng, unlabeled["frames"]))

    # forward + decode, no grad
    seq = frames0.shape[0]
    images = jnp.zeros(
        (N_SCAN, seq, SIZE, SIZE, 3), dtype=jnp.float32)

    @jax.jit
    def scan_fwd(variables, images_all):
        def body(c, im):
            hm = model.apply(variables, im, train=False)
            kp, conf = model.decode(hm)
            return c + jnp.mean(kp) + jnp.mean(conf), 0
        tot, _ = jax.lax.scan(body, 0.0, images_all)
        return tot
    timed("ul forward + decode (no grad)",
          lambda: scan_fwd(variables, images))

    # unsup loss math only
    unsup = loss_factories["unsupervised"]
    kps = jnp.asarray(np_rng.uniform(
        0, 400, (N_SCAN, seq, 2 * K)).astype(np.float32))
    confs = jnp.ones((N_SCAN, seq, K), jnp.float32)

    @jax.jit
    def scan_loss(kps_all, confs_all):
        def body(c, xs):
            kp, cf = xs
            loss, _ = unsup(stage="train", anneal_weight=1.0,
                            keypoints_pred=kp, heatmaps_pred=None,
                            confidences=cf)
            return c + loss, 0
        tot, _ = jax.lax.scan(body, 0.0, (kps_all, confs_all))
        return tot
    timed("ul loss math (pca_singleview + temporal)",
          lambda: scan_loss(kps, confs))

    print(f"\nunlabeled window: {mb_step:.2f} MB/step "
          f"({'i420' if is_i420 else 'rgb'}); "
          f"transfer floor @27 MB/s tunnel = {mb_step / 27 * 1000:.0f} ms, "
          f"@10 GB/s TPU-VM PCIe = {mb_step / 10000 * 1000:.2f} ms")
    print(f"semisup - supervised = {ms_ss - ms_sup:.2f} ms/step "
          "(unlabeled slice incl. backward)")


if __name__ == "__main__":
    main()
