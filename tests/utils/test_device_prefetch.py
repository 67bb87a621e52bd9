"""Unit tests for the double-buffered host->device prefetch generator
(lightning_pose_tpu/utils/video_predictions.py::_device_prefetch).

Covers the contract the predict paths rely on: order-preserving drain,
loader-error propagation, and — the round-5 fix — worker-thread retirement
when the consumer abandons the generator mid-iteration (previously the
daemon worker blocked forever on the bounded queue, pinning the decoder
open for the process lifetime).
"""

import threading
import time

import numpy as np
import pytest

from lightning_pose_tpu.utils.video_predictions import _device_prefetch


def _wait_threads_settle(baseline: set, timeout: float = 5.0) -> set:
    """Return the set of still-alive non-baseline threads after waiting up
    to ``timeout`` for workers to retire."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        extra = {t for t in threading.enumerate() if t not in baseline and t.is_alive()}
        if not extra:
            return set()
        time.sleep(0.05)
    return {t for t in threading.enumerate() if t not in baseline and t.is_alive()}


def test_prefetch_drains_in_order():
    batches = [np.full((2, 2), i, dtype=np.float32) for i in range(5)]
    out = list(_device_prefetch(iter(batches)))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert np.asarray(b)[0, 0] == i


def test_prefetch_propagates_loader_error():
    def bad_loader():
        yield np.zeros((2, 2), dtype=np.float32)
        raise RuntimeError("decode failed")

    gen = _device_prefetch(bad_loader())
    next(gen)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(gen)


def test_prefetch_abandoned_consumer_retires_worker():
    """Closing the generator after one item (consumer raised / broke out)
    must unblock and retire the worker thread even though the queue is full
    and the loader has many batches left."""
    baseline = set(threading.enumerate())
    batches = [np.zeros((4, 4), dtype=np.float32) for _ in range(50)]

    gen = _device_prefetch(iter(batches), depth=1)
    next(gen)
    gen.close()  # triggers the generator's finally -> stop event

    leaked = _wait_threads_settle(baseline)
    assert not leaked, f"prefetch worker leaked: {leaked}"
