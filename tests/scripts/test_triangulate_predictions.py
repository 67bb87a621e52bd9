"""3D-inference script: per-view prediction CSVs -> triangulated 3D
(scripts/triangulate_predictions.py; the reference delegates this workflow
to the external EKS package, reference lightning_pose_3d.rst)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

SCRIPTS = Path(__file__).parents[2] / "scripts"
sys.path.insert(0, str(SCRIPTS))

from triangulate_predictions import triangulate_csvs  # noqa: E402


def _make_rig(tmp_path, n_frames=6, n_kp=3, thresh_mask=False):
    """Synthetic 3-camera rig: known 3D points projected per view."""
    import jax.numpy as jnp

    from lightning_pose_tpu.data.anipose import rodrigues
    from lightning_pose_tpu.data.cameras import project_3d_to_2d

    rng = np.random.default_rng(0)
    rvecs = np.array(
        [[0.0, 0.0, 0.0], [0.0, 0.25, 0.0], [0.0, -0.25, 0.05]]
    )
    trans = np.array([[0.0, 0.0, 0.0], [0.6, 0.0, 0.1], [-0.6, 0.05, 0.1]])
    intr = np.array(
        [[320.0, 0.0, 160.0], [0.0, 320.0, 120.0], [0.0, 0.0, 1.0]]
    )
    extr = np.stack(
        [
            np.concatenate([rodrigues(rv), t.reshape(3, 1)], axis=1)
            for rv, t in zip(rvecs, trans)
        ]
    ).astype(np.float32)
    intr_all = np.tile(intr, (3, 1, 1)).astype(np.float32)
    dist = np.zeros((3, 5), dtype=np.float32)

    pts3d = rng.uniform(-0.5, 0.5, (n_frames, n_kp, 3)).astype(np.float32)
    pts3d[..., 2] += 4.0
    pts2d = np.asarray(
        project_3d_to_2d(
            jnp.asarray(pts3d),
            jnp.asarray(np.tile(intr_all, (n_frames, 1, 1, 1))),
            jnp.asarray(np.tile(extr, (n_frames, 1, 1, 1))),
            jnp.asarray(np.tile(dist, (n_frames, 1, 1))),
        )
    )  # (frames, V, K, 2)

    # calibration TOML (anipose format; rotation as rodrigues vector)
    toml_lines = []
    for v, name in enumerate(["Cam-A", "Cam-B", "Cam-C"]):
        toml_lines += [
            f"[cam_{v}]",
            f'name = "{name}"',
            "matrix = [[320.0, 0.0, 160.0], [0.0, 320.0, 120.0], [0.0, 0.0, 1.0]]",
            f"rotation = [{rvecs[v][0]}, {rvecs[v][1]}, {rvecs[v][2]}]",
            f"translation = [{trans[v][0]}, {trans[v][1]}, {trans[v][2]}]",
            "distortions = [0.0, 0.0, 0.0, 0.0, 0.0]",
            "",
        ]
    calib_file = tmp_path / "calibration.toml"
    calib_file.write_text("\n".join(toml_lines))

    # per-view DLC CSVs
    cols = pd.MultiIndex.from_product(
        [["m"], [f"kp{i}" for i in range(n_kp)], ["x", "y", "likelihood"]],
        names=["scorer", "bodyparts", "coords"],
    )
    csvs = []
    for v, name in enumerate(["Cam-A", "Cam-B", "Cam-C"]):
        arr = np.concatenate(
            [pts2d[:, v], np.ones((n_frames, n_kp, 1), np.float32)], axis=-1
        ).reshape(n_frames, -1)
        df = pd.DataFrame(arr, columns=cols)
        if thresh_mask and v == 0:
            # low confidence on keypoint 0 in view 0 only
            df.loc[:, ("m", "kp0", "likelihood")] = 0.1
        path = tmp_path / f"session1_{name}.csv"
        df.to_csv(path)
        csvs.append(path)
    return calib_file, csvs, pts3d


def test_triangulation_recovers_3d(tmp_path):
    calib, csvs, pts3d = _make_rig(tmp_path)
    out = triangulate_csvs(calib, csvs)
    n_kp = pts3d.shape[1]
    xyz = out.to_numpy().reshape(len(out), n_kp, 4)[..., :3]
    np.testing.assert_allclose(xyz, pts3d, atol=1e-2)
    views = out.to_numpy().reshape(len(out), n_kp, 4)[..., 3]
    assert (views == 3).all()


def test_confidence_threshold_drops_view(tmp_path):
    """A low-confidence view is excluded; the remaining two still
    triangulate keypoint 0 correctly."""
    calib, csvs, pts3d = _make_rig(tmp_path, thresh_mask=True)
    out = triangulate_csvs(calib, csvs, confidence_thresh=0.5)
    n_kp = pts3d.shape[1]
    arr = out.to_numpy().reshape(len(out), n_kp, 4)
    np.testing.assert_allclose(arr[..., :3], pts3d, atol=1e-2)
    assert (arr[:, 0, 3] == 2).all()  # kp0: one view dropped
    assert (arr[:, 1:, 3] == 3).all()


def test_csv_matching_and_frame_guards(tmp_path):
    calib, csvs, _ = _make_rig(tmp_path)
    # shuffled order is fine (matched by camera-name substring)
    out = triangulate_csvs(calib, [csvs[2], csvs[0], csvs[1]])
    assert len(out) == 6
    # ambiguous / missing camera name raises
    with pytest.raises(ValueError, match="exactly one CSV"):
        triangulate_csvs(calib, csvs[:2])
    # frame-count mismatch raises
    df = pd.read_csv(csvs[0], header=[0, 1, 2], index_col=0).iloc[:3]
    df.to_csv(csvs[0])
    with pytest.raises(ValueError, match="different frame counts"):
        triangulate_csvs(calib, csvs)


def test_cli_main_writes_output(tmp_path, capsys):
    calib, csvs, _ = _make_rig(tmp_path)
    import triangulate_predictions as tp

    argv = sys.argv
    try:
        sys.argv = [
            "triangulate_predictions.py", str(calib), *map(str, csvs),
            "--output", str(tmp_path / "out_3d.csv"),
        ]
        tp.main()
    finally:
        sys.argv = argv
    assert (tmp_path / "out_3d.csv").exists()
    out_df = pd.read_csv(tmp_path / "out_3d.csv", header=[0, 1, 2], index_col=0)
    assert out_df.shape[1] == 3 * 4  # 3 keypoints x (x, y, z, num_views)
