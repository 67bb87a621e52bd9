"""Tests for label CSV parsing and path utilities against the bundled data."""

import os
from pathlib import Path

import numpy as np
import pytest

from lightning_pose_tpu.utils import io as io_utils


def test_parse_label_csv(toy_data_dir):
    csv = os.path.join(toy_data_dir, "CollectedData.csv")
    data = io_utils.parse_label_csv(csv)
    assert len(data.keypoint_names) == 17
    assert data.keypoint_names[0] == "paw1LH_top"
    assert data.keypoint_names[-1] == "obsLow_bot"
    assert data.keypoints.shape == (len(data.image_names), 17, 2)
    assert data.keypoints.dtype == np.float32
    assert data.visibility is None
    # spot-check first row against the raw CSV
    assert data.keypoints[0, 0, 0] == pytest.approx(77.25)
    assert data.keypoints[0, 0, 1] == pytest.approx(36.25)
    # nan entries preserved
    assert np.isnan(data.keypoints).any()


def test_get_keypoint_names(toy_data_dir):
    csv = os.path.join(toy_data_dir, "CollectedData.csv")
    names = io_utils.get_keypoint_names(csv_file=csv)
    assert len(names) == 17


def test_get_videos_in_dir(toy_data_dir):
    vids = io_utils.get_videos_in_dir(os.path.join(toy_data_dir, "videos"))
    assert len(vids) >= 1
    assert all(v.endswith(".mp4") for v in vids)


def test_check_video_paths_single_file(toy_data_dir):
    vids = io_utils.get_videos_in_dir(os.path.join(toy_data_dir, "videos"))
    out = io_utils.check_video_paths(vids[0])
    assert out == [vids[0]]


def test_get_context_img_paths():
    paths = io_utils.get_context_img_paths(Path("labeled-data/img000017.png"))
    assert [p.name for p in paths] == [
        "img000015.png", "img000016.png", "img000017.png",
        "img000018.png", "img000019.png",
    ]
    # negative indices floored at 0
    paths = io_utils.get_context_img_paths(Path("labeled-data/img001.png"))
    assert [p.name for p in paths] == [
        "img000.png", "img000.png", "img001.png", "img002.png", "img003.png",
    ]


def test_ckpt_path_from_base_path(tmp_path):
    base = tmp_path
    ckpt_dir = base / "tb_logs" / "m" / "version_1" / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    (ckpt_dir / "epoch=3-step=100.ckpt").touch()
    (ckpt_dir / "epoch=5-step=200-best.ckpt").touch()
    old = base / "tb_logs" / "m" / "version_0" / "checkpoints"
    old.mkdir(parents=True)
    (old / "epoch=1-step=10-best.ckpt").touch()
    out = io_utils.ckpt_path_from_base_path(str(base), "m")
    assert out is not None and "version_1" in out and "-best.ckpt" in out
    # no best -> fall back to highest step
    (ckpt_dir / "epoch=5-step=200-best.ckpt").unlink()
    out = io_utils.ckpt_path_from_base_path(str(base), "m")
    assert out is not None and out.endswith("epoch=3-step=100.ckpt")
    # nothing found
    assert io_utils.ckpt_path_from_base_path(str(tmp_path / "nope"), "m") is None


def test_split_video_files_by_view(tmp_path):
    files = [
        Path("sess0_top.mp4"), Path("sess0_bot.mp4"),
        Path("sess1_top.mp4"), Path("sess1_bot.mp4"),
        Path("sess2_top.mp4"),  # missing bot -> skipped
    ]
    out = io_utils.split_video_files_by_view(files, ["top", "bot"])
    assert len(out) == 2
    assert out[0][0].name == "sess0_top.mp4"
    assert out[0][1].name == "sess0_bot.mp4"


def test_extract_session_name():
    assert io_utils.extract_session_name_from_video("mouse_top_3.mp4", ["top"]) == "mouse_3"
    assert io_utils.extract_session_name_from_video("plain.mp4", ["top"]) == "plain"


def test_make_dlc_pandas_index():
    from lightning_pose_tpu.config import Config

    cfg = Config({"model": {"model_type": "heatmap"}})
    idx = io_utils.make_dlc_pandas_index(cfg, ["a", "b"])
    assert idx.names == ["scorer", "bodyparts", "coords"]
    assert list(idx)[0] == ("heatmap_tracker", "a", "x")
    assert len(idx) == 6


def test_fix_empty_first_row():
    import pandas as pd

    cols = pd.MultiIndex.from_product([["s"], ["kp"], ["x", "y"]])
    df = pd.DataFrame([[1.0, 2.0]], index=pd.Index(["img1.png"]), columns=cols)
    df.index.name = "img0.png"  # pandas absorbed the all-NaN first row
    fixed = io_utils.fix_empty_first_row(df)
    assert fixed.index.name is None
    assert len(fixed) == 2
    assert np.isnan(fixed.iloc[0, 0])


# -- checkpoint discovery edge cases (reference test_io.py:78-232) -------------


def _touch_ckpts(tmp_path, model_name, version, names, logging_dir="tb_logs"):
    import os

    d = tmp_path / logging_dir / model_name / f"version_{version}" / "checkpoints"
    d.mkdir(parents=True, exist_ok=True)
    for n in names:
        (d / n).write_bytes(b"x")
    return d


def test_ckpt_discovery_no_checkpoints(tmp_path):
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    assert ckpt_path_from_base_path(str(tmp_path), "m") is None
    (tmp_path / "tb_logs" / "m" / "version_0" / "checkpoints").mkdir(parents=True)
    assert ckpt_path_from_base_path(str(tmp_path), "m") is None


def test_ckpt_discovery_multiple_best_picks_highest_step(tmp_path, caplog):
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    _touch_ckpts(tmp_path, "m", 0,
                 ["epoch=1-step=10-best.ckpt", "epoch=3-step=30-best.ckpt"])
    found = ckpt_path_from_base_path(str(tmp_path), "m")
    assert found.endswith("epoch=3-step=30-best.ckpt")


def test_ckpt_discovery_highest_version_wins(tmp_path):
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    _touch_ckpts(tmp_path, "m", 0, ["epoch=9-step=90-best.ckpt"])
    _touch_ckpts(tmp_path, "m", 2, ["epoch=1-step=10-best.ckpt"])
    found = ckpt_path_from_base_path(str(tmp_path), "m")
    assert "version_2" in found


def test_ckpt_discovery_no_best_falls_back_to_highest_step(tmp_path):
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    _touch_ckpts(tmp_path, "m", 0,
                 ["epoch=1-step=10.ckpt", "epoch=5-step=50.ckpt"])
    found = ckpt_path_from_base_path(str(tmp_path), "m")
    assert found.endswith("epoch=5-step=50.ckpt")


def test_ckpt_discovery_single_non_best(tmp_path):
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    _touch_ckpts(tmp_path, "m", 0, ["last.ckpt"])
    found = ckpt_path_from_base_path(str(tmp_path), "m")
    assert found.endswith("last.ckpt")


def test_ckpt_discovery_unparseable_steps_raises(tmp_path):
    import pytest

    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    _touch_ckpts(tmp_path, "m", 0, ["alpha.ckpt", "beta.ckpt"])
    with pytest.raises(ValueError, match="manually select"):
        ckpt_path_from_base_path(str(tmp_path), "m")


def test_ckpt_discovery_custom_logging_dir(tmp_path):
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    _touch_ckpts(tmp_path, "m", 0, ["epoch=0-step=1-best.ckpt"],
                 logging_dir="custom_logs")
    assert ckpt_path_from_base_path(str(tmp_path), "m") is None
    found = ckpt_path_from_base_path(
        str(tmp_path), "m", logging_dir_name="custom_logs"
    )
    assert found is not None and "custom_logs" in found


def test_find_video_files_for_views(tmp_path):
    from lightning_pose_tpu.utils.io import find_video_files_for_views

    vids = tmp_path / "videos"
    vids.mkdir()
    for name in ["sessA_top.mp4", "sessA_bot.mp4",
                 "sessB_top.mp4", "sessB_bot.mp4"]:
        (vids / name).write_bytes(b"x")
    sessions = find_video_files_for_views(str(vids), ["top", "bot"])
    assert len(sessions) == 2
    for views in sessions:
        assert len(views) == 2
        # per-session ordering follows view_names
        assert "top" in str(views[0]) and "bot" in str(views[1])


def test_find_video_files_for_views_skips_incomplete_sessions(tmp_path):
    """Sessions missing a view are silently skipped (reference
    utils/io.py:622-627), and an empty video dir raises."""
    import pytest

    from lightning_pose_tpu.utils.io import find_video_files_for_views

    vids = tmp_path / "videos"
    vids.mkdir()
    with pytest.raises(FileNotFoundError, match="No video files"):
        find_video_files_for_views(str(vids), ["top", "bot"])
    (vids / "sessA_top.mp4").write_bytes(b"x")  # bot view missing
    (vids / "sessB_top.mp4").write_bytes(b"x")
    (vids / "sessB_bot.mp4").write_bytes(b"x")
    sessions = find_video_files_for_views(str(vids), ["top", "bot"])
    assert len(sessions) == 1
    assert all("sessB" in str(v) for v in sessions[0])


def test_collect_video_files_by_view(tmp_path):
    """Exact-one-file-per-view matching with word-boundary semantics
    (reference utils/io.py:467-495)."""
    from pathlib import Path

    from lightning_pose_tpu.utils.io import collect_video_files_by_view

    files = [Path("sess1_top.mp4"), Path("sess1_bot.mp4")]
    out = collect_video_files_by_view(files, ["top", "bot"])
    assert out["top"].name == "sess1_top.mp4"
    assert out["bot"].name == "sess1_bot.mp4"

    # word boundary: view 'top' must not match 'laptop'
    with pytest.raises(ValueError, match="not found for view"):
        collect_video_files_by_view(
            [Path("sess1_laptop.mp4"), Path("sess1_bot.mp4")], ["top", "bot"]
        )

    # one view matching two files is ambiguous
    with pytest.raises(ValueError, match="matches multiple"):
        collect_video_files_by_view(
            [Path("a_top.mp4"), Path("b_top.mp4")], ["top", "top"]
        )

    # count mismatch is rejected up front
    with pytest.raises(AssertionError):
        collect_video_files_by_view([Path("a_top.mp4")], ["top", "bot"])


# --- return_absolute_path battery (reference tests/utils/test_io.py:25-77) ---


def test_return_absolute_path_unchanged(tmp_path):
    assert io_utils.return_absolute_path(str(tmp_path)) == str(tmp_path)


def test_return_absolute_path_missing_raises(tmp_path):
    with pytest.raises(OSError):
        io_utils.return_absolute_path(str(tmp_path / "does_not_exist"))


def test_return_absolute_path_relative_from_cwd(tmp_path, monkeypatch):
    fake_cwd = tmp_path / "a"
    fake_cwd.mkdir()
    target = tmp_path / "data"
    target.mkdir()
    monkeypatch.chdir(fake_cwd)
    assert io_utils.return_absolute_path("data", n_dirs_back=1) == str(target)


def test_return_absolute_path_relative_missing_raises(tmp_path, monkeypatch):
    fake_cwd = tmp_path / "a"
    fake_cwd.mkdir()
    monkeypatch.chdir(fake_cwd)
    with pytest.raises(OSError):
        io_utils.return_absolute_path("nonexistent_dir", n_dirs_back=1)


def test_return_absolute_path_multirun_strips_extra_dir(tmp_path, monkeypatch):
    """Hydra multirun layout: one extra level removed when the resolved
    parent is named 'multirun' (reference io.py:322-330)."""
    run_dir = tmp_path / "multirun" / "run1"
    run_dir.mkdir(parents=True)
    target = tmp_path / "data"
    target.mkdir()
    monkeypatch.chdir(run_dir)
    assert io_utils.return_absolute_path("data", n_dirs_back=1) == str(target)


# --- parse_label_csv error paths (reference tests/utils/test_io.py:682-717) ---


def test_parse_label_csv_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        io_utils.parse_label_csv(str(tmp_path / "nonexistent.csv"))


def test_parse_label_csv_invalid_visibility_raises(tmp_path):
    content = (
        "scorer,scorer,scorer,scorer\n"
        "bodyparts,kp1,kp1,kp1\n"
        "coords,x,y,visible\n"
        "labeled-data/img01.png,10.0,20.0,9\n"
    )
    p = tmp_path / "bad.csv"
    p.write_text(content)
    with pytest.raises(ValueError, match="invalid values"):
        io_utils.parse_label_csv(str(p))


def test_parse_label_csv_single_read(toy_data_dir, monkeypatch):
    """The CSV is read exactly once (the reference had a double-read bug)."""
    import pandas as pd

    count = 0
    orig = pd.read_csv

    def counting(*args, **kwargs):
        nonlocal count
        count += 1
        return orig(*args, **kwargs)

    monkeypatch.setattr(pd, "read_csv", counting)
    io_utils.parse_label_csv(os.path.join(toy_data_dir, "CollectedData.csv"))
    assert count == 1


def test_parse_label_csv_visibility_values(tmp_path):
    """visible column round-trips 0/1/2 as int flags and NaN coords stay
    NaN (reference tests/utils/test_io.py:658-681)."""
    content = (
        "scorer,s,s,s,s,s,s\n"
        "bodyparts,kp1,kp1,kp1,kp2,kp2,kp2\n"
        "coords,x,y,visible,x,y,visible\n"
        "labeled-data/img01.png,10.0,20.0,2,30.0,40.0,1\n"
        "labeled-data/img02.png,,,0,50.0,60.0,2\n"
    )
    p = tmp_path / "vis.csv"
    p.write_text(content)
    data = io_utils.parse_label_csv(str(p))
    assert data.keypoints.shape == (2, 2, 2)
    assert data.visibility is not None
    assert data.visibility.shape == (2, 2)
    np.testing.assert_array_equal(data.visibility, [[2, 1], [0, 2]])
    assert np.isnan(data.keypoints[1, 0]).all()
    np.testing.assert_allclose(data.keypoints[0, 0], [10.0, 20.0])
