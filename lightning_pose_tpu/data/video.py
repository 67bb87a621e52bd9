"""Host video decode pipeline — the DALI replacement.

The reference feeds unlabeled video through NVIDIA DALI's GPU decoder
(reference lightning_pose/data/dali.py:70-778). On TPU there is no NVDEC;
the TPU-native design is a **host decode stage** (OpenCV's C++/ffmpeg
decoder on the TPU-VM's many CPU cores) with background prefetch threads
feeding fixed-shape uint8 batches, while resize/normalize/augment run fused
on device.

Batch policies mirror the DALI pipes (reference dali.py:519-562,699-760):

- predict/base: sequential ``sequence_length``-frame windows; the last
  batch is FILLed by repeating the final frame so shapes stay static.
- predict/context: overlapping windows with step = sequence_length - 4,
  skipping the first two frames (reference dali.py:564-673), matched by the
  shift-by-2 fix in PredictionHandler.
- train: random-start windows, seeded per host/replica (replaces DALI's
  per-GPU ``device_id``/seed sharding, reference dali.py:580-592).

Multi-core decode: a single H.264/H.265 stream decodes serially, so on
many-core TPU-VM hosts the loaders shard the video BY WINDOW across
``decode_threads`` worker decoders (each seeks to its window start and
decodes one batch; batches are re-emitted in order) — the CPU analog of
DALI's parallel NVDEC pipelines. Window assignment is deterministic, so
the emitted batch stream is identical for any thread count (parity-tested
in tests/data/test_video.py).
"""

from __future__ import annotations

import logging
import os
import queue
import threading

import cv2
import numpy as np

logger = logging.getLogger(__name__)


def default_decode_threads() -> int:
    """Worker-decoder count: LP_TPU_DECODE_THREADS env var, else
    min(4, cores-1) — 1 on small hosts, 4 on real TPU-VMs."""
    env = os.environ.get("LP_TPU_DECODE_THREADS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            logger.warning(
                "ignoring malformed LP_TPU_DECODE_THREADS=%r "
                "(expected an integer)", env,
            )
    return max(1, min(4, (os.cpu_count() or 1) - 1))

__all__ = [
    "count_frames",
    "VideoFrameDecoder",
    "PredictVideoLoader",
    "UnlabeledVideoLoader",
    "undo_affine_transform_batch",
]


def count_frames(video_file: str) -> int:
    """Number of frames in a video (reference data/utils.py:89)."""
    cap = cv2.VideoCapture(str(video_file))
    try:
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if n > 0:
            return n
        # fall back to an exhaustive scan for containers with bad metadata
        n = 0
        while True:
            ret = cap.grab()
            if not ret:
                break
            n += 1
        return n
    finally:
        cap.release()


class VideoFrameDecoder:
    """Sequential decoder: RGB uint8 frames resized on host (C++/ffmpeg)."""

    def __init__(self, video_file: str, resize_height: int, resize_width: int):
        self.video_file = str(video_file)
        self.h = int(resize_height)
        self.w = int(resize_width)
        self.cap = cv2.VideoCapture(self.video_file)
        if not self.cap.isOpened():
            raise FileNotFoundError(f"could not open video {video_file}")
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.orig_height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.orig_width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))

    def read_raw(self) -> np.ndarray | None:
        """Decode one native-resolution BGR frame (no conversion/resize)."""
        ret, frame = self.cap.read()
        return frame if ret else None

    def read(self) -> np.ndarray | None:
        frame = self.read_raw()
        if frame is None:
            return None
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        return cv2.resize(frame, (self.w, self.h), interpolation=cv2.INTER_LINEAR)

    def seek(self, frame_idx: int) -> None:
        self.cap.set(cv2.CAP_PROP_POS_FRAMES, frame_idx)

    def close(self) -> None:
        self.cap.release()


class PredictVideoLoader:
    """Fixed-shape frame batches for video inference, with background
    prefetch overlap of decode and TPU compute."""

    def __init__(
        self,
        video_file: str,
        sequence_length: int,
        resize_height: int,
        resize_width: int,
        do_context: bool = False,
        prefetch_batches: int = 3,
        bbox_df=None,
        decode_threads: int | None = None,
        transfer_format: str = "rgb",
    ):
        """``bbox_df``: optional per-frame [x, y, h, w] DataFrame — bbox-crop
        mode decodes at full resolution and crops+resizes each frame
        (reference dali.py:332-396); batches then carry per-frame bboxes.
        ``decode_threads``: worker decoders sharding the video by window
        (default :func:`default_decode_threads`).
        ``transfer_format``: 'rgb' emits (T, h, w, 3) uint8 batches;
        'yuv420' emits planar I420 (T, h*3/2, w) uint8 — half the
        host->device bytes, converted to RGB on device
        (ops/yuv.i420_to_normalized_rgb)."""
        self.video_file = str(video_file)
        self.seq_len = int(sequence_length)
        self.h = int(resize_height)
        self.w = int(resize_width)
        self.do_context = do_context
        if transfer_format not in ("rgb", "yuv420"):
            raise ValueError(f"unknown transfer_format {transfer_format!r}")
        if transfer_format == "yuv420" and (self.h % 2 or self.w % 2):
            raise ValueError("yuv420 transfer requires even resize dims")
        self.transfer_format = transfer_format
        self.prefetch_batches = prefetch_batches
        # fail fast on bad paths instead of iterating zero batches (the
        # reference's DALI filename validation, reference dali.py:449-455)
        if not os.path.isfile(self.video_file):
            raise FileNotFoundError(
                f"video file does not exist or is not a file: "
                f"{self.video_file}"
            )
        self.frame_count = count_frames(self.video_file)
        if self.frame_count <= 0:
            raise RuntimeError(f"could not decode any frames from {self.video_file}")
        self.bbox_df = bbox_df
        self.decode_threads = (
            decode_threads if decode_threads is not None
            else default_decode_threads()
        )
        # context windows step by seq_len - 4 (reference dali.py:636-651)
        self.step = self.seq_len - 4 if do_context else self.seq_len

    def __len__(self) -> int:
        if self.do_context:
            usable = max(self.frame_count - 4, 1)
            return int(np.ceil(usable / self.step))
        return int(np.ceil(self.frame_count / self.seq_len))

    def _finalize(self, rgb_batch: np.ndarray) -> np.ndarray:
        """Apply the transfer format: passthrough RGB or batched I420
        (native worker-pool conversion, cv2 fallback)."""
        if self.transfer_format == "rgb":
            return rgb_batch
        from lightning_pose_tpu import native

        return native.batch_rgb_to_i420(rgb_batch)

    def _convert(self, raw_frames: list[np.ndarray], start_idx: int) -> np.ndarray:
        """Raw BGR native-res frames -> (T, h, w, 3) RGB uint8 batch (fused
        native BGR->RGB+resize, parallelized across frames), in
        ``transfer_format`` layout."""
        from lightning_pose_tpu import native

        stacked = np.stack(raw_frames)
        if self.bbox_df is None:
            return self._finalize(
                native.batch_resize_rgb(stacked, self.h, self.w, swap_rb=True)
            )
        # bbox-crop mode: per-frame crop+resize (reference dali.py:332-396)
        n = stacked.shape[0]
        idx = np.minimum(
            np.arange(start_idx, start_idx + n), len(self.bbox_df) - 1
        )
        boxes = self.bbox_df[["x", "y", "h", "w"]].to_numpy()[idx].astype(
            np.int32
        )
        lib = native.get_lib()
        out = np.empty((n, self.h, self.w, 3), dtype=np.uint8)
        if lib is not None:
            lib.batch_crop_resize_rgb(
                np.ascontiguousarray(stacked).ctypes.data, n,
                stacked.shape[1], stacked.shape[2],
                np.ascontiguousarray(boxes).ctypes.data,
                out.ctypes.data, self.h, self.w, 1,
                native.num_worker_threads(),
            )
        else:
            for i in range(n):
                x, y, bh, bw = boxes[i]
                crop = np.zeros((bh, bw, 3), dtype=np.uint8)
                x0, y0 = max(x, 0), max(y, 0)
                x1 = min(x + bw, stacked.shape[2])
                y1 = min(y + bh, stacked.shape[1])
                if x1 > x0 and y1 > y0:
                    crop[y0 - y:y1 - y, x0 - x:x1 - x] = stacked[i, y0:y1, x0:x1]
                out[i] = cv2.resize(
                    cv2.cvtColor(crop, cv2.COLOR_BGR2RGB), (self.w, self.h)
                )
        return self._finalize(out)

    def _produce(self, q: queue.Queue) -> None:
        decoder = VideoFrameDecoder(self.video_file, self.h, self.w)
        convert = self._convert

        try:
            if not self.do_context:
                # decode raw BGR frames sequentially (the codec is serial),
                # then convert+resize the whole window in one fused native
                # call parallelized across frames
                last_frame = None
                batch = []
                frame_idx = 0
                while True:
                    frame = decoder.read_raw()
                    if frame is None:
                        break
                    last_frame = frame
                    batch.append(frame)
                    if len(batch) == self.seq_len:
                        q.put(convert(batch, frame_idx))
                        frame_idx += len(batch)
                        batch = []
                if batch:
                    # FILL policy: repeat the final frame (reference
                    # dali.py:699-760)
                    while len(batch) < self.seq_len:
                        batch.append(last_frame)
                    q.put(convert(batch, frame_idx))
            else:
                # overlapping windows: rolling raw-frame buffer (seq_len - 4
                # frames carry over between windows), fused native convert
                # per window — bounded memory for arbitrarily long videos
                n_batches = len(self)
                buf: list[np.ndarray] = []
                start = 0
                emitted = 0
                while True:
                    frame = decoder.read_raw()
                    if frame is None:
                        break
                    buf.append(frame)
                    if len(buf) == self.seq_len:
                        q.put(convert(buf, start))
                        emitted += 1
                        buf = buf[self.step:]
                        start += self.step
                # tail windows: FILL-pad with the final decoded frame
                while emitted < n_batches:
                    window = list(buf[: self.seq_len])
                    if not window:
                        window = [
                            np.zeros(
                                (decoder.orig_height, decoder.orig_width, 3),
                                dtype=np.uint8,
                            )
                        ]
                    while len(window) < self.seq_len:
                        window.append(window[-1])
                    q.put(convert(window, start))
                    emitted += 1
                    buf = buf[self.step:]
                    start += self.step
        finally:
            decoder.close()
            q.put(None)

    def _decode_window(self, decoder: "VideoFrameDecoder", k: int) -> np.ndarray:
        """Seek-decode window ``k`` ([k*step, k*step+seq_len), FILL-padded)."""
        start = k * self.step
        count = min(self.seq_len, max(self.frame_count - start, 0))
        decoder.seek(start)
        raw: list[np.ndarray] = []
        for _ in range(count):
            frame = decoder.read_raw()
            if frame is None:
                break
            raw.append(frame)
        if not raw:  # container metadata overstated frame_count
            decoder.seek(max(self.frame_count - 1, 0))
            frame = decoder.read_raw()
            raw.append(
                frame
                if frame is not None
                else np.zeros(
                    (decoder.orig_height, decoder.orig_width, 3), dtype=np.uint8
                )
            )
        while len(raw) < self.seq_len:
            raw.append(raw[-1])  # FILL policy (reference dali.py:699-760)
        return self._convert(raw, start)

    def _iter_parallel(self):
        """Window-sharded parallel decode: worker w handles windows
        w, w+K, w+2K, ...; the main thread re-emits them in order. Output
        is identical to the serial path for any thread count."""
        n_batches = len(self)
        n_workers = min(self.decode_threads, n_batches)
        results: dict[int, np.ndarray] = {}
        errors: list[BaseException] = []
        cond = threading.Condition()
        emitted = [0]
        max_pending = n_workers + self.prefetch_batches

        def worker(wid: int) -> None:
            decoder = VideoFrameDecoder(self.video_file, self.h, self.w)
            try:
                for k in range(wid, n_batches, n_workers):
                    with cond:
                        while (
                            k - emitted[0] >= max_pending and not errors
                        ):
                            cond.wait()
                        if errors:
                            return
                    batch = self._decode_window(decoder, k)
                    with cond:
                        results[k] = batch
                        cond.notify_all()
            except BaseException as e:  # propagate to the consumer
                with cond:
                    errors.append(e)
                    cond.notify_all()
            finally:
                decoder.close()

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(n_workers)
        ]
        for t in threads:
            t.start()
        try:
            for k in range(n_batches):
                with cond:
                    while k not in results and not errors:
                        cond.wait()
                    if errors:
                        raise errors[0]
                    batch = results.pop(k)
                    emitted[0] = k + 1
                    cond.notify_all()
                yield batch
        finally:
            with cond:
                if not errors:
                    errors.append(GeneratorExit("consumer stopped"))
                cond.notify_all()
            for t in threads:
                t.join(timeout=10.0)

    def __iter__(self):
        if self.decode_threads > 1:
            yield from self._iter_parallel()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item


class MultiviewPredictVideoLoader:
    """Frame-synchronized fixed-shape batches over one video per view.

    Validates equal frame counts across views up front (the reference's
    DALI multiview frame-count checks, reference dali.py:483-506) and
    yields ``(T, V, H, W, 3)`` windows with the same FILL policy as the
    single-view loader.
    """

    def __init__(
        self,
        video_files: list[str],
        sequence_length: int,
        resize_height: int,
        resize_width: int,
        transfer_format: str = "rgb",
        do_context: bool = False,
    ):
        self.video_files = [str(v) for v in video_files]
        self.loaders = [
            PredictVideoLoader(
                v, sequence_length, resize_height, resize_width,
                transfer_format=transfer_format, do_context=do_context,
            )
            for v in self.video_files
        ]
        counts = [ld.frame_count for ld in self.loaders]
        if len(set(counts)) != 1:
            raise RuntimeError(
                f"multiview videos have mismatched frame counts: "
                f"{dict(zip(self.video_files, counts))}"
            )
        self.frame_count = counts[0]
        self.seq_len = int(sequence_length)

    def __len__(self) -> int:
        return len(self.loaders[0])

    def __iter__(self):
        for windows in zip(*self.loaders):
            # (T, V, H, W, 3) rgb or (T, V, H*3/2, W) planar I420
            yield np.stack(windows, axis=1)


class UnlabeledVideoLoader:
    """Random-window unlabeled-frame loader for semi-supervised training.

    Each ``__next__`` yields a contiguous ``sequence_length``-frame window
    starting at a random position of a randomly chosen video — the
    counterpart of the seeded DALI random reader (reference
    dali.py:148-152,580-592). For multi-host training, pass a distinct
    ``shard_id`` per host to decorrelate sampling.
    """

    def __init__(
        self,
        video_files: list[str],
        sequence_length: int,
        resize_height: int,
        resize_width: int,
        seed: int = 123456,
        shard_id: int = 0,
        prefetch_batches: int = 2,
        decode_threads: int | None = None,
        transfer_format: str = "rgb",
    ):
        assert len(video_files) > 0, "no unlabeled videos found"
        self.video_files = [str(v) for v in video_files]
        self.seq_len = int(sequence_length)
        self.h = int(resize_height)
        self.w = int(resize_width)
        self.seed = int(seed)
        self.shard_id = int(shard_id)
        if transfer_format not in ("rgb", "yuv420"):
            raise ValueError(f"unknown transfer_format {transfer_format!r}")
        if transfer_format == "yuv420" and (self.h % 2 or self.w % 2):
            raise ValueError("yuv420 transfer requires even resize dims")
        self.transfer_format = transfer_format
        # fail fast on bad paths (the reference's DALI filename validation,
        # reference dali.py:449-455) instead of hanging the sampler
        missing = [v for v in self.video_files if not os.path.isfile(v)]
        if missing:
            raise FileNotFoundError(f"unlabeled video files not found: {missing}")
        self.frame_counts = [count_frames(v) for v in self.video_files]
        unreadable = [
            v for v, n in zip(self.video_files, self.frame_counts) if n <= 0
        ]
        if unreadable:
            raise RuntimeError(
                f"could not decode any frames from: {unreadable}"
            )
        n_workers = (
            decode_threads if decode_threads is not None
            else default_decode_threads()
        )
        self._n_workers = max(1, int(n_workers))
        self._prefetch = int(prefetch_batches)
        self._stop = threading.Event()
        self._cond = threading.Condition()
        self._results: dict[int, dict] = {}
        self._errors: list[BaseException] = []
        self._next_emit = 0
        self._threads = [
            threading.Thread(target=self._produce, args=(wid,), daemon=True)
            for wid in range(self._n_workers)
        ]
        for t in self._threads:
            t.start()

    def _window_params(self, k: int) -> tuple[int, int]:
        """Deterministic (video_idx, start_frame) for the k-th window —
        a counter-keyed RNG stream, so the sample sequence is identical
        for any decode-thread count (and per-host via ``shard_id``,
        replacing the seeded DALI random reader, reference dali.py:580-592).
        """
        rng = np.random.default_rng([self.seed, self.shard_id, k])
        vid_idx = int(rng.integers(len(self.video_files)))
        n = self.frame_counts[vid_idx]
        start = int(rng.integers(max(n - self.seq_len, 1)))
        return vid_idx, start

    def _decode_window(self, decoder: VideoFrameDecoder, start: int) -> dict:
        decoder.seek(start)
        frames = []
        for _ in range(self.seq_len):
            frame = decoder.read()
            if frame is None:
                break
            frames.append(frame)
        if not frames:
            frames = [np.zeros((self.h, self.w, 3), dtype=np.uint8)]
        while len(frames) < self.seq_len:
            frames.append(frames[-1])
        # full-frame bbox in original video resolution (reference DALI
        # batches carry orig_size for the model->frame remap)
        bbox = np.tile(
            np.array(
                [0.0, 0.0, decoder.orig_height, decoder.orig_width],
                dtype=np.float32,
            ),
            (self.seq_len, 1),
        )
        stacked = np.stack(frames)
        if self.transfer_format == "yuv420":
            from lightning_pose_tpu import native

            stacked = native.batch_rgb_to_i420(stacked)
        return {"frames": stacked, "bbox": bbox}

    def _produce(self, wid: int) -> None:
        decoders: dict[int, VideoFrameDecoder] = {}
        max_lead = self._n_workers + self._prefetch
        try:
            k = wid
            while not self._stop.is_set():
                with self._cond:
                    while (
                        k - self._next_emit >= max_lead
                        and not self._stop.is_set()
                    ):
                        self._cond.wait(timeout=0.5)
                if self._stop.is_set():
                    return
                vid_idx, start = self._window_params(k)
                if vid_idx not in decoders:
                    decoders[vid_idx] = VideoFrameDecoder(
                        self.video_files[vid_idx], self.h, self.w
                    )
                batch = self._decode_window(decoders[vid_idx], start)
                with self._cond:
                    self._results[k] = batch
                    self._cond.notify_all()
                k += self._n_workers
        except BaseException as exc:  # surface worker death to the consumer
            with self._cond:
                self._errors.append(exc)
                self._cond.notify_all()
        finally:
            for d in decoders.values():
                d.close()

    def __next__(self) -> dict:
        with self._cond:
            k = self._next_emit
            while (
                k not in self._results
                and not self._errors
                and not self._stop.is_set()
            ):
                self._cond.wait(timeout=0.5)
            if self._errors:
                self._stop.set()
                self._cond.notify_all()
                raise RuntimeError(
                    "unlabeled-video decode worker failed"
                ) from self._errors[0]
            if self._stop.is_set() and k not in self._results:
                raise StopIteration
            batch = self._results.pop(k)
            self._next_emit = k + 1
            self._cond.notify_all()
        return batch

    def close(self) -> None:
        self._stop.set()
        with self._cond:
            self._cond.notify_all()
        # join before decoders are garbage-collected (cv2 teardown from a
        # live daemon thread can crash at interpreter shutdown)
        for t in self._threads:
            t.join(timeout=10.0)


class MultiviewUnlabeledVideoLoader:
    """Frame-synchronized random windows across one video per view per
    session (the multiview DALI train reader with shared seeds, reference
    dali.py:148-152,589-592).

    ``__next__`` yields {"frames": (T, V, H, W, 3), "bbox": (T, V*4),
    "is_multiview": True}.
    """

    def __init__(
        self,
        sessions: list[list[str]],
        sequence_length: int,
        resize_height: int,
        resize_width: int,
        seed: int = 123456,
        shard_id: int = 0,
    ):
        assert len(sessions) > 0, "no multiview unlabeled sessions found"
        self.sessions = [[str(v) for v in views] for views in sessions]
        self.seq_len = int(sequence_length)
        self.h = int(resize_height)
        self.w = int(resize_width)
        self.rng = np.random.default_rng(seed + shard_id)
        self.frame_counts = []
        for views in self.sessions:
            counts = [count_frames(v) for v in views]
            if len(set(counts)) != 1:
                raise RuntimeError(
                    f"multiview session has mismatched frame counts: "
                    f"{dict(zip(views, counts))}"
                )
            self.frame_counts.append(counts[0])
        self._decoders: dict[str, VideoFrameDecoder] = {}

    def _decoder(self, path: str) -> VideoFrameDecoder:
        if path not in self._decoders:
            self._decoders[path] = VideoFrameDecoder(path, self.h, self.w)
        return self._decoders[path]

    def _decode_view(self, path: str, start: int) -> tuple[np.ndarray, np.ndarray]:
        decoder = self._decoder(path)
        decoder.seek(start)
        frames = []
        for _ in range(self.seq_len):
            frame = decoder.read()
            if frame is None:
                break
            frames.append(frame)
        if not frames:
            # container metadata can overstate the frame count; a seek past
            # the real end yields nothing (same guard as _decode_window)
            frames = [np.zeros((self.h, self.w, 3), dtype=np.uint8)]
        while len(frames) < self.seq_len:
            frames.append(frames[-1])
        bbox = np.tile(
            np.array(
                [0.0, 0.0, decoder.orig_height, decoder.orig_width],
                dtype=np.float32,
            ),
            (self.seq_len, 1),
        )
        return np.stack(frames), bbox

    def __next__(self) -> dict:
        s = int(self.rng.integers(len(self.sessions)))
        n = self.frame_counts[s]
        start = int(self.rng.integers(max(n - self.seq_len, 1)))
        views = self.sessions[s]
        if len(views) > 1 and default_decode_threads() > 1:
            # each view is an independent stream: decode them concurrently
            from concurrent.futures import ThreadPoolExecutor

            if not hasattr(self, "_pool"):
                self._pool = ThreadPoolExecutor(
                    max_workers=min(len(views), default_decode_threads())
                )
            results = list(
                self._pool.map(lambda p: self._decode_view(p, start), views)
            )
        else:
            results = [self._decode_view(p, start) for p in views]
        view_frames = [r[0] for r in results]
        bboxes = [r[1] for r in results]
        return {
            "frames": np.stack(view_frames, axis=1),  # (T, V, H, W, 3)
            "bbox": np.concatenate(bboxes, axis=1),  # (T, V*4)
            "is_multiview": True,
        }

    def close(self) -> None:
        if hasattr(self, "_pool"):
            self._pool.shutdown(wait=True)
        for d in self._decoders.values():
            d.close()


def undo_affine_transform_batch(keypoints, transforms):
    """Invert the per-frame 2x3 augmentation matrices applied to unlabeled
    frames (reference data/utils.py:192-235).

    Args:
        keypoints: ``(B, 2K)`` flat predicted keypoints in augmented coords.
        transforms: ``(B, 2, 3)`` forward affine matrices (augmented =
            M @ [x, y, 1]). A zero/identity matrix batch is a no-op.

    Returns:
        ``(B, 2K)`` keypoints mapped back to original frame coords.
    """
    import jax.numpy as jnp

    b = keypoints.shape[0]
    kp = keypoints.reshape(b, -1, 2)
    a = transforms[:, :, :2]  # (B, 2, 2)
    t = transforms[:, :, 2]  # (B, 2)
    a_inv = jnp.linalg.inv(a)
    kp_orig = jnp.einsum("bij,bkj->bki", a_inv, kp - t[:, None, :])
    return kp_orig.reshape(b, -1)
