"""Window-sharded parallel decode scaling: throughput at 1/2/4 threads.

Synthesizes a long test video, runs PredictVideoLoader's window-sharded
decoder at several thread counts, and prints a frames/sec table — the
evidence backing the multi-core TPU-VM scaling claim (this 1-core dev rig
shows ~flat numbers; a many-core host shows the wins).

    python scripts/bench_decode_scaling.py [n_frames] [threads...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def make_video(path: str, n_frames: int, h: int = 406, w: int = 396) -> None:
    import cv2
    import numpy as np

    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (w, h)
    )
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    for i in range(n_frames):
        frame = np.roll(base, shift=i * 3, axis=1)  # cheap motion
        writer.write(frame)
    writer.release()


def main() -> None:
    from lightning_pose_tpu.data.video import PredictVideoLoader

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    threads = [int(t) for t in sys.argv[2:]] or [1, 2, 4]

    tmp = tempfile.mkdtemp(prefix="lp_decode_bench_")
    video = os.path.join(tmp, "synthetic.mp4")
    make_video(video, n_frames)

    results = {}
    for t in threads:
        loader = PredictVideoLoader(
            video, sequence_length=64, resize_height=256, resize_width=256,
            decode_threads=t,
        )
        t0 = time.time()
        n = sum(b.shape[0] for b in loader)
        elapsed = time.time() - t0
        results[t] = n / elapsed
        print(f"threads={t}: {results[t]:.1f} frames/s ({n} frames, {elapsed:.2f}s)")

    base = results[threads[0]]
    print(json.dumps({
        "metric": "parallel_decode_frames_per_sec",
        "host_cores": os.cpu_count(),
        "results": {str(k): round(v, 1) for k, v in results.items()},
        "speedup_vs_1_thread": {
            str(k): round(v / base, 2) for k, v in results.items()
        },
    }))


if __name__ == "__main__":
    main()
