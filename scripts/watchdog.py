"""Stall watchdog for real-TPU training scripts.

The remote-TPU tunnel can hang a single RPC for many minutes. ``run_watched``
re-execs the calling script as a ``--child`` subprocess, watches the output
dir for file progress, and kills + restarts (the child must honor
``--resume`` by setting ``training.resume=true``, losing at most
``check_val_every_n_epoch`` epochs) when nothing is written for
``stall_secs``. The stall window must exceed the scanned train program's
cold XLA compile, which alone can pass 10 min through the tunnel (nothing
is written during compile).
"""

import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path


def _newest_mtime(out_dir: Path) -> float:
    newest = 0.0
    if out_dir.exists():
        for p in out_dir.rglob("*"):
            try:
                newest = max(newest, p.stat().st_mtime)
            except OSError:
                pass
    return newest


def run_watched(script: str, root: Path, name: str,
                stall_secs: int, max_attempts: int = 6) -> dict:
    """Run ``python <script> <root> --child <name> [--resume]`` under the
    stall watchdog; the child must print a JSON result as its last
    ``{``-prefixed stdout line."""
    out_dir = root / name
    for attempt in range(max_attempts):
        cmd = [sys.executable, os.path.abspath(script), str(root),
               "--child", name]
        if attempt > 0:
            cmd.append("--resume")
        proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
        )
        lines: list[str] = []

        def _pump(stream=proc.stdout, sink=lines):
            for ln in stream:
                print(ln, end="", flush=True)
                sink.append(ln)

        t = threading.Thread(target=_pump, daemon=True)
        t.start()
        start = time.time()
        while proc.poll() is None:
            time.sleep(30)
            last = max(_newest_mtime(out_dir), start)
            if time.time() - last > stall_secs:
                print(f"[watchdog] {name} attempt {attempt + 1}: no progress "
                      f"for {stall_secs}s — killing (tunnel hang?)",
                      flush=True)
                proc.kill()
                proc.wait()
                break
        t.join(timeout=10)
        if proc.returncode == 0:
            for ln in reversed(lines):
                if ln.startswith("{"):
                    return json.loads(ln)
            raise SystemExit(f"{name}: child exited 0 without a result line")
        time.sleep(30)  # give the tunnel a moment before retrying
    raise SystemExit(f"{name}: failed after {max_attempts} attempts")
