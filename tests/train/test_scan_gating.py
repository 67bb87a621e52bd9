"""Gating rules for the epoch-scan training loop
(cfg.training.scan_epochs: auto | true | false)."""

from lightning_pose_tpu.train.trainer import resolve_scan_epochs


def test_auto_scans_on_accelerators_only():
    assert resolve_scan_epochs("auto", "tpu", True, False)
    assert resolve_scan_epochs("auto", "gpu", True, False)
    assert not resolve_scan_epochs("auto", "cpu", True, False)


def test_explicit_override_beats_platform():
    assert resolve_scan_epochs("true", "cpu", True, False)
    assert resolve_scan_epochs(True, "cpu", True, False)
    assert not resolve_scan_epochs("false", "tpu", True, False)
    assert not resolve_scan_epochs(False, "tpu", True, False)


def test_scan_requires_device_cache():
    assert not resolve_scan_epochs("true", "tpu", False, False)


def test_semi_supervised_scans_single_host_only():
    """Semi-supervised epochs scan too (the epoch's unlabeled windows
    prefetch on the host and ship stacked) — except under multi-host DP,
    where per-process unlabeled shards assemble per step."""
    assert resolve_scan_epochs("true", "tpu", True, True)
    assert resolve_scan_epochs("auto", "tpu", True, True)
    assert not resolve_scan_epochs("true", "tpu", True, True, multihost=True)
    assert not resolve_scan_epochs("auto", "tpu", True, True, multihost=True)
    # supervised multihost still scans
    assert resolve_scan_epochs("auto", "tpu", True, False, multihost=True)
