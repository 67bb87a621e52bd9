"""Tests for patch masking, JSON progress trackers, and migrations."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_pose_tpu.callbacks import (
    JSONInferenceProgressTracker,
    JSONTrainingProgressTracker,
    apply_patch_mask,
    patch_mask_ratio,
)


def test_patch_mask_ratio_ramp():
    assert float(patch_mask_ratio(0, 0.0, 0.5, 100, 200)) == 0.0
    assert float(patch_mask_ratio(150, 0.0, 0.5, 100, 200)) == pytest.approx(0.25)
    assert float(patch_mask_ratio(500, 0.0, 0.5, 100, 200)) == pytest.approx(0.5)


def test_patch_mask_ratio_zero_before_start():
    """Strictly before the curriculum's init step the ratio is 0, NOT
    init_ratio; at the init step it is exactly init_ratio (reference
    callbacks.py:333-345)."""
    assert float(patch_mask_ratio(99, 0.1, 0.5, 100, 200)) == 0.0
    assert float(patch_mask_ratio(100, 0.1, 0.5, 100, 200)) == pytest.approx(0.1)
    assert float(patch_mask_ratio(200, 0.1, 0.5, 100, 200)) == pytest.approx(0.5)


def test_apply_patch_mask_exact_count(rng):
    """Exactly floor(ratio * num_patches) patches are zeroed per image
    (reference PatchMasker masks a randperm prefix of that length)."""
    images = jnp.ones((4, 64, 64, 3))
    for ratio, expect_masked in [(0.5, 8), (0.3, 4), (1.0, 16)]:
        out = apply_patch_mask(jax.random.PRNGKey(0), images, jnp.float32(ratio), 16)
        arr = np.asarray(out)
        # zeros arrive in whole 16x16 patches
        patches = arr.reshape(4, 4, 16, 4, 16, 3)
        per_patch = patches.mean(axis=(2, 4, 5))
        assert set(np.unique(per_patch)) <= {0.0, 1.0}
        masked_per_image = (per_patch.reshape(4, -1) == 0).sum(axis=1)
        assert (masked_per_image == expect_masked).all(), ratio
    # ratio 0 -> untouched
    out0 = apply_patch_mask(jax.random.PRNGKey(0), images, jnp.float32(0.0), 16)
    np.testing.assert_allclose(np.asarray(out0), 1.0)


def test_apply_patch_mask_deterministic_per_key():
    """Same rng key -> identical mask; different keys -> different masks
    (reference test_callbacks.py:335-366)."""
    images = jnp.ones((2, 64, 64, 3))
    a = np.asarray(apply_patch_mask(jax.random.PRNGKey(3), images, jnp.float32(0.5), 16))
    b = np.asarray(apply_patch_mask(jax.random.PRNGKey(3), images, jnp.float32(0.5), 16))
    c = np.asarray(apply_patch_mask(jax.random.PRNGKey(4), images, jnp.float32(0.5), 16))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_json_training_tracker(tmp_path):
    path = tmp_path / "status.json"
    tracker = JSONTrainingProgressTracker(path, total_epochs=10)
    tracker.update(4)
    payload = json.loads(path.read_text())
    assert payload["status"] == "TRAINING"
    assert payload["current_epoch"] == 4
    assert payload["progress"] == 50.0


def test_json_inference_tracker(tmp_path):
    """Reference schema: {"completed", "total", "timestamp"}
    (reference callbacks.py:475-482)."""
    path = tmp_path / "status.json"
    tracker = JSONInferenceProgressTracker(path, total_batches=4)
    payload = json.loads(path.read_text())  # written eagerly at init
    assert payload["completed"] == 0 and payload["total"] == 4
    tracker.step()
    payload = json.loads(path.read_text())
    assert payload["completed"] == 1 and payload["total"] == 4
    assert "timestamp" in payload
    tracker.finish()
    assert json.loads(path.read_text())["completed"] == 4


def test_migrations(tmp_path):
    from lightning_pose_tpu.migrations import run_migrations
    from lightning_pose_tpu.migrations.migrations import rename_time_directories

    bad = tmp_path / "outputs" / "2024-01-01" / "12:30:45"
    bad.mkdir(parents=True)
    (bad / "marker.txt").touch()
    n = rename_time_directories(tmp_path / "outputs")
    assert n == 1
    assert (tmp_path / "outputs" / "2024-01-01" / "12-30-45" / "marker.txt").exists()
    run_migrations(tmp_path)  # no-op second time
