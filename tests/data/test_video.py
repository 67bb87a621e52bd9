"""Tests for the host video decode pipeline (DALI replacement) —
mirroring reference tests/data/test_dali.py batch-policy coverage."""

import numpy as np
import pytest

from lightning_pose_tpu.data.video import (
    PredictVideoLoader,
    UnlabeledVideoLoader,
    VideoFrameDecoder,
    count_frames,
)


@pytest.fixture(scope="module")
def video_file():
    import os

    path = "/root/reference/data/mirror-mouse-example/videos/test_vid.mp4"
    if not os.path.exists(path):
        pytest.skip("test video not available")
    return path


def test_count_frames(video_file):
    assert count_frames(video_file) == 994


def test_decoder(video_file):
    d = VideoFrameDecoder(video_file, 64, 64)
    frame = d.read()
    assert frame.shape == (64, 64, 3)
    assert frame.dtype == np.uint8
    assert d.orig_height == 406 and d.orig_width == 396
    d.close()


def test_predict_loader_fill_policy(video_file):
    """994 frames at seq_len 64 -> 16 batches; last is FILLed with the final
    frame (reference dali.py:699-760)."""
    loader = PredictVideoLoader(video_file, 64, 64, 64)
    batches = list(loader)
    assert len(batches) == int(np.ceil(994 / 64))
    assert all(b.shape == (64, 64, 64, 3) for b in batches)
    total_rows = sum(b.shape[0] for b in batches)
    assert total_rows >= 994
    # FILL: trailing rows of last batch repeat the final frame
    last = batches[-1]
    n_pad = total_rows - 994
    for i in range(1, n_pad + 1):
        np.testing.assert_array_equal(last[-i], last[-n_pad - 1])


def test_predict_loader_context_overlap(video_file):
    """Context windows step by seq_len - 4 (reference dali.py:636-651)."""
    loader = PredictVideoLoader(video_file, 16, 32, 32, do_context=True)
    batches = list(loader)
    assert all(b.shape == (16, 32, 32, 3) for b in batches)
    # each batch of T frames yields T-4 usable outputs; total >= frame count
    usable = len(batches) * (16 - 4)
    assert usable >= 994 - 4


def test_unlabeled_loader(video_file):
    loader = UnlabeledVideoLoader(
        [video_file], sequence_length=8, resize_height=32, resize_width=32, seed=1
    )
    item = next(loader)
    assert item["frames"].shape == (8, 32, 32, 3)
    assert item["bbox"].shape == (8, 4)
    np.testing.assert_allclose(item["bbox"][0], [0, 0, 406, 396])
    item2 = next(loader)
    # random windows should differ
    assert not np.array_equal(item["frames"], item2["frames"])
    loader.close()


def test_predict_loader_bbox_crop(video_file):
    """bbox-crop mode: full-res decode + per-frame crop+resize."""
    import pandas as pd

    n = 40
    bbox_df = pd.DataFrame(
        {"x": [50] * n, "y": [60] * n, "h": [120] * n, "w": [120] * n}
    )
    loader = PredictVideoLoader(
        video_file, sequence_length=8, resize_height=64, resize_width=64,
        bbox_df=bbox_df,
    )
    batch = next(iter(loader))
    assert batch.shape == (8, 64, 64, 3)
    # compare frame 0 against a manual crop+resize
    import cv2

    cap = cv2.VideoCapture(video_file)
    _, frame = cap.read()
    cap.release()
    manual = cv2.resize(
        cv2.cvtColor(frame[60:180, 50:170], cv2.COLOR_BGR2RGB), (64, 64)
    )
    diff = np.abs(batch[0].astype(int) - manual.astype(int))
    assert diff.max() <= 2, f"max diff {diff.max()}"


@pytest.mark.parametrize("do_context", [False, True])
def test_parallel_decode_matches_serial(video_file, do_context):
    """Window-sharded parallel decode emits the exact same batch stream as
    the single-decoder path (seek-based decode is frame-accurate)."""
    kwargs = dict(
        video_file=video_file, sequence_length=16, resize_height=64,
        resize_width=64, do_context=do_context,
    )
    serial = list(PredictVideoLoader(decode_threads=1, **kwargs))
    parallel = list(PredictVideoLoader(decode_threads=3, **kwargs))
    assert len(serial) == len(parallel)
    for i, (a, b) in enumerate(zip(serial, parallel)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(a, b, err_msg=f"batch {i}")


def test_unlabeled_loader_thread_count_invariant(video_file):
    """The seeded random-window sequence is identical for any decode-thread
    count (counter-keyed RNG streams, not sequential draws)."""
    def take(n_threads, n=4):
        loader = UnlabeledVideoLoader(
            [video_file], sequence_length=4, resize_height=32,
            resize_width=32, seed=7, decode_threads=n_threads,
        )
        try:
            return [next(loader) for _ in range(n)]
        finally:
            loader.close()

    one = take(1)
    three = take(3)
    for a, b in zip(one, three):
        np.testing.assert_array_equal(a["frames"], b["frames"])
        np.testing.assert_array_equal(a["bbox"], b["bbox"])


def test_unlabeled_loader_shard_id_decorrelates(video_file):
    loader0 = UnlabeledVideoLoader(
        [video_file], sequence_length=4, resize_height=32, resize_width=32,
        seed=7, shard_id=0, decode_threads=1,
    )
    loader1 = UnlabeledVideoLoader(
        [video_file], sequence_length=4, resize_height=32, resize_width=32,
        seed=7, shard_id=1, decode_threads=1,
    )
    try:
        a = [next(loader0)["frames"] for _ in range(3)]
        b = [next(loader1)["frames"] for _ in range(3)]
        assert any(not np.array_equal(x, y) for x, y in zip(a, b))
    finally:
        loader0.close()
        loader1.close()


def test_unlabeled_loader_worker_error_propagates(video_file, monkeypatch):
    """A dying decode worker must raise in the consumer, not hang
    __next__ forever (the workers are daemon threads; without error
    propagation semi-supervised training would spin silently)."""
    from lightning_pose_tpu.data import video as video_mod

    def boom(self, decoder, start):
        raise OSError("simulated decoder failure")

    monkeypatch.setattr(video_mod.UnlabeledVideoLoader, "_decode_window", boom)
    loader = UnlabeledVideoLoader(
        [video_file], sequence_length=4, resize_height=32, resize_width=32,
        seed=3, decode_threads=2,
    )
    try:
        with pytest.raises(RuntimeError, match="decode worker failed"):
            next(loader)
    finally:
        loader.close()


def test_default_decode_threads_malformed_env(monkeypatch):
    """Malformed LP_TPU_DECODE_THREADS falls back to the computed default
    with a warning instead of raising deep inside loader construction."""
    from lightning_pose_tpu.data.video import default_decode_threads

    monkeypatch.setenv("LP_TPU_DECODE_THREADS", "four")
    assert default_decode_threads() >= 1
    monkeypatch.setenv("LP_TPU_DECODE_THREADS", "1,2")
    assert default_decode_threads() >= 1
    monkeypatch.setenv("LP_TPU_DECODE_THREADS", "3")
    assert default_decode_threads() == 3


def test_multiview_unlabeled_loader_parallel_views(mv_data_dir, monkeypatch):
    """Per-view concurrent decode yields the same frame-synchronized
    windows as serial view iteration."""
    import os

    from lightning_pose_tpu.data.video import MultiviewUnlabeledVideoLoader

    session = [
        os.path.join(mv_data_dir, "videos", "test_vid_top.mp4"),
        os.path.join(mv_data_dir, "videos", "test_vid_bot.mp4"),
    ]

    def take(n_threads, n=3):
        monkeypatch.setenv("LP_TPU_DECODE_THREADS", str(n_threads))
        loader = MultiviewUnlabeledVideoLoader(
            sessions=[session], sequence_length=4,
            resize_height=32, resize_width=32, seed=5,
        )
        try:
            return [next(loader) for _ in range(n)]
        finally:
            loader.close()

    serial = take(1)
    parallel = take(3)
    for a, b in zip(serial, parallel):
        assert a["frames"].shape == (4, 2, 32, 32, 3)
        np.testing.assert_array_equal(a["frames"], b["frames"])
        np.testing.assert_array_equal(a["bbox"], b["bbox"])


def test_predict_loader_missing_file_raises(tmp_path):
    """Bad paths fail fast instead of yielding zero batches (reference
    test_dali.py:138-159 nonexistent-file / directory-path cases)."""
    with pytest.raises(FileNotFoundError, match="does not exist"):
        PredictVideoLoader(str(tmp_path / "nope.mp4"), 8, 64, 64)
    with pytest.raises(FileNotFoundError, match="does not exist"):
        PredictVideoLoader(str(tmp_path), 8, 64, 64)  # directory


def test_predict_loader_unreadable_file_raises(tmp_path):
    bad = tmp_path / "garbage.mp4"
    bad.write_bytes(b"not a video at all")
    with pytest.raises(RuntimeError, match="could not decode"):
        PredictVideoLoader(str(bad), 8, 64, 64)


def test_unlabeled_loader_missing_file_raises(tmp_path, video_file):
    with pytest.raises(FileNotFoundError, match="not found"):
        UnlabeledVideoLoader(
            [video_file, str(tmp_path / "nope.mp4")], 4, 64, 64, seed=0
        )


def test_multiview_predict_loader_mismatched_frames_raises(
    tmp_path, video_file
):
    """Views with unequal frame counts must raise up front (reference
    test_dali.py:249-266 / dali.py:483-506)."""
    import cv2

    from lightning_pose_tpu.data.video import MultiviewPredictVideoLoader

    short = tmp_path / "short.mp4"
    cap = cv2.VideoCapture(video_file)
    wr = cv2.VideoWriter(
        str(short), cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
        (int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
         int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))),
    )
    for _ in range(10):
        ret, frame = cap.read()
        assert ret
        wr.write(frame)
    cap.release()
    wr.release()
    with pytest.raises(RuntimeError, match="mismatched frame counts"):
        MultiviewPredictVideoLoader([video_file, str(short)], 8, 64, 64)
