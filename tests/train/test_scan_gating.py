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


def test_semi_supervised_scans_everywhere():
    """Semi-supervised epochs scan too (the epoch's unlabeled windows
    prefetch on the host and ship stacked); under multi-host DP each host
    stacks its own decode shard (shard_stacked_local_batch) so the gate is
    gone since round 4 (2-process trajectory parity:
    tests/test_multihost.py::test_two_process_scanned_semisup_parity)."""
    assert resolve_scan_epochs("true", "tpu", True, True)
    assert resolve_scan_epochs("auto", "tpu", True, True)
    assert resolve_scan_epochs("true", "tpu", True, True, multihost=True)
    assert resolve_scan_epochs("auto", "tpu", True, True, multihost=True)
    assert resolve_scan_epochs("auto", "tpu", True, False, multihost=True)
