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
"""

from __future__ import annotations

import logging
import queue
import threading

import cv2
import numpy as np

logger = logging.getLogger(__name__)

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
        self.frame_count = count_frames(self.video_file)
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
    ):
        """``bbox_df``: optional per-frame [x, y, h, w] DataFrame — bbox-crop
        mode decodes at full resolution and crops+resizes each frame
        (reference dali.py:332-396); batches then carry per-frame bboxes."""
        self.video_file = str(video_file)
        self.seq_len = int(sequence_length)
        self.h = int(resize_height)
        self.w = int(resize_width)
        self.do_context = do_context
        self.prefetch_batches = prefetch_batches
        self.frame_count = count_frames(self.video_file)
        self.bbox_df = bbox_df
        # context windows step by seq_len - 4 (reference dali.py:636-651)
        self.step = self.seq_len - 4 if do_context else self.seq_len

    def __len__(self) -> int:
        if self.do_context:
            usable = max(self.frame_count - 4, 1)
            return int(np.ceil(usable / self.step))
        return int(np.ceil(self.frame_count / self.seq_len))

    def _produce(self, q: queue.Queue) -> None:
        from lightning_pose_tpu import native

        decoder = VideoFrameDecoder(self.video_file, self.h, self.w)

        def convert(raw_frames: list[np.ndarray], start_idx: int) -> np.ndarray:
            stacked = np.stack(raw_frames)
            if self.bbox_df is None:
                return native.batch_resize_rgb(
                    stacked, self.h, self.w, swap_rb=True
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
            return out

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
                # overlapping windows: keep a rolling buffer
                frames: list[np.ndarray] = []
                while True:
                    frame = decoder.read()
                    if frame is None:
                        break
                    frames.append(frame)
                arr = np.stack(frames) if frames else np.zeros(
                    (1, self.h, self.w, 3), dtype=np.uint8
                )
                n = arr.shape[0]
                start = 0
                while start == 0 or start + 4 < n:
                    window = arr[start:start + self.seq_len]
                    if window.shape[0] < self.seq_len:
                        pad = np.tile(
                            window[-1:], (self.seq_len - window.shape[0], 1, 1, 1)
                        )
                        window = np.concatenate([window, pad], axis=0)
                    q.put(window)
                    start += self.step
        finally:
            decoder.close()
            q.put(None)

    def __iter__(self):
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
    ):
        self.video_files = [str(v) for v in video_files]
        self.loaders = [
            PredictVideoLoader(v, sequence_length, resize_height, resize_width)
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
            yield np.stack(windows, axis=1)  # (T, V, H, W, 3)


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
    ):
        assert len(video_files) > 0, "no unlabeled videos found"
        self.video_files = [str(v) for v in video_files]
        self.seq_len = int(sequence_length)
        self.h = int(resize_height)
        self.w = int(resize_width)
        self.rng = np.random.default_rng(seed + shard_id)
        self.frame_counts = [count_frames(v) for v in self.video_files]
        self._decoders: dict[int, VideoFrameDecoder] = {}
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch_batches)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _decoder(self, vid_idx: int) -> VideoFrameDecoder:
        if vid_idx not in self._decoders:
            self._decoders[vid_idx] = VideoFrameDecoder(
                self.video_files[vid_idx], self.h, self.w
            )
        return self._decoders[vid_idx]

    def _produce(self) -> None:
        while not self._stop.is_set():
            vid_idx = int(self.rng.integers(len(self.video_files)))
            n = self.frame_counts[vid_idx]
            start = int(self.rng.integers(max(n - self.seq_len, 1)))
            decoder = self._decoder(vid_idx)
            decoder.seek(start)
            frames = []
            for _ in range(self.seq_len):
                frame = decoder.read()
                if frame is None:
                    break
                frames.append(frame)
            if not frames:
                continue
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
            try:
                self._queue.put(
                    {"frames": np.stack(frames), "bbox": bbox}, timeout=5.0
                )
            except queue.Full:
                continue

    def __next__(self) -> dict:
        return self._queue.get()

    def close(self) -> None:
        self._stop.set()
        # drain the queue so a blocked put() can observe the stop flag,
        # then join before releasing decoders (cv2 teardown from a live
        # daemon thread can crash at interpreter shutdown)
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=10.0)
        for d in self._decoders.values():
            d.close()


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

    def __next__(self) -> dict:
        s = int(self.rng.integers(len(self.sessions)))
        n = self.frame_counts[s]
        start = int(self.rng.integers(max(n - self.seq_len, 1)))
        view_frames = []
        bboxes = []
        for path in self.sessions[s]:
            decoder = self._decoder(path)
            decoder.seek(start)
            frames = []
            for _ in range(self.seq_len):
                frame = decoder.read()
                if frame is None:
                    break
                frames.append(frame)
            while len(frames) < self.seq_len:
                frames.append(frames[-1])
            view_frames.append(np.stack(frames))
            bboxes.append(
                np.tile(
                    np.array(
                        [0.0, 0.0, decoder.orig_height, decoder.orig_width],
                        dtype=np.float32,
                    ),
                    (self.seq_len, 1),
                )
            )
        return {
            "frames": np.stack(view_frames, axis=1),  # (T, V, H, W, 3)
            "bbox": np.concatenate(bboxes, axis=1),  # (T, V*4)
            "is_multiview": True,
        }

    def close(self) -> None:
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
