"""Project-converter script tests (reference keeps converters untested;
these lock the LP-layout output contract for DLC input projects)."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_img(path):
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, np.random.randint(0, 255, (24, 24, 3), dtype=np.uint8))


@pytest.fixture()
def dlc_project(tmp_path):
    """Minimal DLC project: two videos' labeled-data dirs with
    CollectedData CSVs + frames + a videos dir."""
    root = tmp_path / "dlc"
    for vid in ("sessA", "sessB"):
        d = root / "labeled-data" / vid
        d.mkdir(parents=True)
        cols = pd.MultiIndex.from_tuples(
            [("scorer", kp, c) for kp in ("nose", "tail") for c in ("x", "y")],
            names=["scorer", "bodyparts", "coords"],
        )
        idx = [f"labeled-data/{vid}/img{i:03d}.png" for i in range(3)]
        df = pd.DataFrame(
            np.random.default_rng(0).uniform(0, 24, (3, 4)),
            index=pd.Index(idx), columns=cols,
        )
        df.to_csv(d / "CollectedData_scorer.csv")
        for i in range(3):
            _write_img(str(d / f"img{i:03d}.png"))
    (root / "labeled-data" / ".DS_Store").touch()  # hidden files skipped
    (root / "labeled-data" / "sessA_labeled").mkdir()  # _labeled dirs skipped
    (root / "videos").mkdir()
    (root / "videos" / "sessA.mp4").write_bytes(b"fake")
    return root


def test_dlc2lp_conversion(dlc_project, tmp_path):
    lp_dir = tmp_path / "lp"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "converters", "dlc2lp.py"),
            "--dlc_dir", str(dlc_project),
            "--lp_dir", str(lp_dir),
        ],
        capture_output=True, text=True,
    )
    assert result.returncode == 0, result.stderr

    merged = pd.read_csv(
        lp_dir / "CollectedData.csv", header=[0, 1, 2], index_col=0
    )
    assert len(merged) == 6  # 3 frames x 2 sessions
    assert set(merged.columns.get_level_values("bodyparts")) == {"nose", "tail"}
    # frames and videos copied into the LP layout
    assert (lp_dir / "labeled-data" / "sessA" / "img000.png").exists()
    assert (lp_dir / "labeled-data" / "sessB" / "img002.png").exists()
    assert (lp_dir / "videos" / "sessA.mp4").exists()
    # the converted project parses with the real label loader
    from lightning_pose_tpu.utils.io import parse_label_csv

    labeled = parse_label_csv(str(lp_dir / "CollectedData.csv"))
    assert labeled.keypoints.shape == (6, 2, 2)


def test_dlc2lp_same_dir_rejected(dlc_project):
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "converters", "dlc2lp.py"),
            "--dlc_dir", str(dlc_project),
            "--lp_dir", str(dlc_project),
        ],
        capture_output=True, text=True,
    )
    assert result.returncode != 0
    assert "cannot be the same" in result.stderr
