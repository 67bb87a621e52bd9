"""Benchmark: end-to-end video inference frames/sec/chip (ResNet-50 heatmap).

Mirrors the reference's headline benchmark (reference
docs/source/user_guide_advanced/mixed_precision.rst:268-283: `litpose
predict`, single-view ResNet-50, 256px, seq_len 64 — T4 FP32 469 frames in
165.2 s = 2.84 fps; A100 ~9 fps). Baseline for ``vs_baseline`` is the T4
FP32 number; the north-star target is >=4x that on one TPU chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

VIDEO = "/root/reference/data/mirror-mouse-example/videos/test_vid.mp4"
T4_FPS_BASELINE = 469 / 165.2  # reference mixed_precision.rst:268-279


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightning_pose_tpu.data.video import PredictVideoLoader, count_frames
    from lightning_pose_tpu.models.heatmap_tracker import HeatmapTracker
    from lightning_pose_tpu.ops.preprocess import normalize_images
    from lightning_pose_tpu.data import bboxes as bboxes_mod

    # 128-frame windows amortize per-call overhead best on v5e (the
    # reference likewise tunes seq_len per device, mixed_precision.rst)
    seq_len = 128
    size = 256
    model = HeatmapTracker(
        backbone_arch="resnet50", num_keypoints=17, image_size=size,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((seq_len, size, size, 3), dtype=jnp.float32)
    variables = model.init(rng, dummy, train=False)

    @jax.jit
    def predict(variables, frames, bbox):
        images = normalize_images(frames.astype(jnp.float32))
        heatmaps = model.apply(variables, images, train=False)
        preds, confs = model.decode(heatmaps, fast=True)
        preds = bboxes_mod.model_to_frame_batch(preds, bbox, size, size)
        return preds, confs

    n_frames = count_frames(VIDEO)
    loader = PredictVideoLoader(
        VIDEO, sequence_length=seq_len, resize_height=size, resize_width=size
    )
    bbox = jnp.tile(jnp.asarray([0.0, 0.0, 406.0, 396.0]), (seq_len, 1))

    # compile warmup (excluded: the reference's timing also excludes
    # one-time CUDA/cuDNN init via prior runs)
    out = predict(variables, dummy, bbox)
    jax.block_until_ready(out)

    t0 = time.time()
    outs = []
    for batch in loader:
        outs.append(predict(variables, jnp.asarray(batch), bbox))
    # force full host materialization (block_until_ready is unreliable
    # through remote-device tunnels)
    results = [(np.asarray(kp), np.asarray(conf)) for kp, conf in outs]
    elapsed = time.time() - t0
    fps = n_frames / elapsed
    assert len(results) == len(loader)

    print(
        json.dumps(
            {
                "metric": "video_inference_fps_per_chip_resnet50_heatmap",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / T4_FPS_BASELINE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
