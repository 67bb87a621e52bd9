"""bench.py kill-resilience helpers.

The round-4 postmortem: the driver killed bench.py mid-run (rc=124) and
every completed measurement was lost because results printed once at the
end. The fix emits per-mode salvage/merged JSON lines and recovers the
last complete line from a killed child's partial stdout — these tests pin
that recovery logic (pure host-side parsing; no device needed).
"""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parents[2]


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    # don't let module-level argv sniffing see pytest's args
    old_argv = sys.argv
    sys.argv = ["bench.py"]
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = old_argv
    return mod


def test_last_json_line_picks_last_complete(bench):
    out = (
        'prelude noise\n'
        '{"metric": "a", "value": 1}\n'
        'more noise\n'
        '{"metric": "b", "value": 2}\n'
    )
    assert bench._last_json_line(out) == {"metric": "b", "value": 2}


def test_last_json_line_skips_truncated_tail(bench):
    # child killed mid-write: the final line is incomplete JSON — recovery
    # must fall back to the previous complete line
    out = '{"metric": "a", "value": 1}\n{"metric": "b", "val'
    assert bench._last_json_line(out) == {"metric": "a", "value": 1}


def test_last_json_line_handles_bytes_and_none(bench):
    # subprocess.TimeoutExpired carries raw bytes (or None) for stdout
    assert bench._last_json_line(b'{"x": 1}\n') == {"x": 1}
    assert bench._last_json_line(None) is None
    assert bench._last_json_line("no json here\n") is None


def test_short_scan_result_shape(bench):
    r = bench._short_scan_result(15, 0.5, flops_step=1e9, extra_key=7)
    assert r["partial"] is True
    assert r["steps_per_sec"] == pytest.approx(30.0)
    assert r["ms_per_step"] == pytest.approx(1000.0 / 30.0)
    assert r["extra_key"] == 7
    assert r["mfu_pct"] is not None
    # formatting keeps the partial marker so merged output flags it
    out = bench._fmt_train(r)
    assert out["partial"] is True
    assert out["metric"] == "train_steps_per_sec_resnet50_heatmap_bs16"


def test_watchdog_retries_past_salvage_for_full_result(bench, monkeypatch):
    """A timeout that yields a salvage line must NOT short-circuit the
    retry loop: a warm-cache retry can complete the full two-point-fit
    measurement, which beats recording the partial methodology."""
    import subprocess

    calls = {"n": 0}

    def fake_run(cmd, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise subprocess.TimeoutExpired(
                cmd, kw.get("timeout"),
                output=b'{"value": 1.0, "partial": true}\n',
            )

        class P:
            returncode = 0
            stdout = '{"value": 2.0}\n'
            stderr = ""

        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    r = bench._watchdog("train", timeout=5, retries=2)
    assert calls["n"] == 2
    assert r == {"value": 2.0}  # the full second-attempt result wins


def test_watchdog_returns_salvage_when_retries_exhaust(bench, monkeypatch):
    import subprocess

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(
            cmd, kw.get("timeout"),
            output=b'{"value": 1.0, "partial": true}\n',
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    r = bench._watchdog("train", timeout=5, retries=2)
    assert r == {"value": 1.0, "partial": True}


def test_fmt_train_semisup_carries_transfer_fields(bench):
    r = bench._short_scan_result(
        10, 1.0, flops_step=None,
        unlabeled_transfer_ms_per_step=12.34, unlabeled_mb_per_step=3.15,
    )
    out = bench._fmt_train_semisup(r)
    assert out["metric"].startswith("train_semisup_")
    assert out["unlabeled_transfer_ms_per_step"] == 12.3
    assert out["unlabeled_mb_per_step"] == 3.15
    assert out["mfu_pct"] is None
