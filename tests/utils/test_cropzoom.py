"""Cropzoom pipeline unit tests (reference tests/utils/test_cropzoom.py).

The reference's tests run on downloaded fixture data; here the detector
predictions / bboxes / frames are synthesized, which exercises the same
bbox math, smoothing, cropping, and CSV-remap contracts hermetically.
"""

import json

import numpy as np
import pandas as pd
import pytest

from lightning_pose_tpu.utils import cropzoom as cz


def _pred_df(n_frames=6, keypoints=("nose", "tail"), seed=0):
    rng = np.random.default_rng(seed)
    cols = pd.MultiIndex.from_tuples(
        [(kp, c) for kp in keypoints for c in ("x", "y", "likelihood")],
        names=["bodyparts", "coords"],
    )
    cols = pd.MultiIndex.from_tuples(
        [("scorer", a, b) for a, b in cols],
        names=["scorer", "bodyparts", "coords"],
    )
    data = np.zeros((n_frames, len(cols)))
    for j, (_, _, c) in enumerate(cols):
        if c == "likelihood":
            data[:, j] = 0.99
        else:
            data[:, j] = rng.uniform(50, 150, n_frames)
    idx = [f"labeled-data/sess/img{i:03d}.png" for i in range(n_frames)]
    return pd.DataFrame(data, index=pd.Index(idx), columns=cols)


# -- bbox size / bbox dataframe ---------------------------------------------


def _df_from_points(points):
    """One-frame prediction df from [(x, y), ...] keypoint coordinates."""
    names = [f"kp{i}" for i in range(len(points))]
    cols = pd.MultiIndex.from_tuples(
        [("scorer", kp, c) for kp in names for c in ("x", "y", "likelihood")],
        names=["scorer", "bodyparts", "coords"],
    )
    row = [v for (x, y) in points for v in (x, y, 0.99)]
    return pd.DataFrame([row], index=pd.Index(["img000.png"]), columns=cols)


def test_bbox_size_span_times_ratio_even():
    df = _df_from_points([(0.0, 0.0), (10.0, 21.0)])  # span x=10, y=21
    bbox = cz._compute_bbox_df(df, anchor_keypoints=[], crop_ratio=1.0)
    # max span 21 -> ceil 21 -> rounded up to even 22, square
    assert bbox[["h", "w"]].to_numpy().tolist() == [[22, 22]]
    bbox2 = cz._compute_bbox_df(df, anchor_keypoints=[], crop_ratio=2.0)
    assert bbox2[["h", "w"]].to_numpy().tolist() == [[42, 42]]


def test_bbox_size_ignores_nan():
    df = _df_from_points([(0.0, 0.0), (10.0, 10.0), (np.nan, np.nan)])
    bbox = cz._compute_bbox_df(df, anchor_keypoints=[], crop_ratio=1.0)
    assert bbox[["h", "w"]].to_numpy().tolist() == [[10, 10]]


def test_compute_bbox_df_centroid_and_size():
    df = _pred_df(n_frames=3)
    bbox = cz._compute_bbox_df(df, anchor_keypoints=[], crop_ratio=1.5)
    assert list(bbox.columns) == ["x", "y", "h", "w"]
    assert (bbox.index == df.index).all()
    # even dims everywhere
    assert (bbox["h"] % 2 == 0).all() and (bbox["w"] % 2 == 0).all()
    # square
    assert (bbox["h"] == bbox["w"]).all()
    # topleft = centroid - size//2
    xs = df.loc[:, df.columns.get_level_values("coords") == "x"].to_numpy()
    ys = df.loc[:, df.columns.get_level_values("coords") == "y"].to_numpy()
    centroid_x = xs.mean(axis=1)
    centroid_y = ys.mean(axis=1)
    np.testing.assert_array_equal(
        bbox["x"].to_numpy(),
        np.int64(centroid_x - bbox["w"].to_numpy() // 2),
    )
    np.testing.assert_array_equal(
        bbox["y"].to_numpy(),
        np.int64(centroid_y - bbox["h"].to_numpy() // 2),
    )


def test_compute_bbox_df_anchor_subset():
    df = _pred_df(keypoints=("nose", "tail", "paw"))
    all_kp = cz._compute_bbox_df(df, anchor_keypoints=[], crop_ratio=1.0)
    nose_only = cz._compute_bbox_df(df, anchor_keypoints=["nose"], crop_ratio=1.0)
    # single anchor keypoint -> zero span -> zero-size bbox centered on it
    assert (nose_only["h"] == 0).all()
    assert not (all_kp["h"] == 0).all()


def test_compute_bbox_df_invalid_anchor_raises():
    df = _pred_df()
    with pytest.raises(AssertionError, match="not found"):
        cz._compute_bbox_df(df, anchor_keypoints=["unicorn"], crop_ratio=1.0)


def test_compute_bbox_df_fixed_size_evens_odd_dims():
    df = _pred_df()
    bbox = cz._compute_bbox_df(
        df, anchor_keypoints=[], crop_height=101, crop_width=64
    )
    assert (bbox["h"] == 102).all()
    assert (bbox["w"] == 64).all()


def test_compute_bbox_df_arg_validation():
    df = _pred_df()
    with pytest.raises(ValueError, match="not both"):
        cz._compute_bbox_df(
            df, anchor_keypoints=[], crop_ratio=1.0, crop_height=64, crop_width=64
        )
    with pytest.raises(ValueError, match="must be provided"):
        cz._compute_bbox_df(df, anchor_keypoints=[])


# -- smoothing ---------------------------------------------------------------


def test_smooth_bbox_rolling_median(tmp_path):
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    bbox = pd.DataFrame(
        {"x": [0, 100, 0, 0, 0], "y": [5, 5, 5, 5, 5],
         "h": [10, 10, 10, 10, 10], "w": [10, 10, 10, 10, 10]},
        index=pd.Index([f"f{i}" for i in range(5)]),
    )
    bbox.to_csv(in_dir / "sess_bbox.csv")
    cz.smooth_bbox(in_dir, out_dir, window=3)
    sm = pd.read_csv(out_dir / "sess_bbox.csv", index_col=0)
    # the x=100 spike at row 1 is median-filtered away; the first row's
    # centered window is [0, 100] -> median 50 (min_periods=1 edge handling)
    assert (sm["x"].iloc[1:] == 0).all()
    assert sm["x"].iloc[0] == 50
    assert (sm["y"] == 5).all()
    meta = json.loads((out_dir / "metadata.json").read_text())
    assert meta["method"] == "median" and meta["window"] == 3


def test_smooth_bbox_errors(tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no .*bbox.csv"):
        cz.smooth_bbox(empty, tmp_path / "out")
    with pytest.raises(ValueError, match="unsupported method"):
        cz.smooth_bbox(empty, tmp_path / "out", method="mean")


# -- cropping ----------------------------------------------------------------


def test_crop_frame_in_bounds():
    frame = np.arange(20 * 20 * 3, dtype=np.uint8).reshape(20, 20, 3)
    crop = cz._crop_frame(frame, x=4, y=2, h=6, w=8)
    np.testing.assert_array_equal(crop, frame[2:8, 4:12])


def test_crop_frame_zero_pads_out_of_bounds():
    frame = np.full((10, 10, 3), 7, dtype=np.uint8)
    crop = cz._crop_frame(frame, x=-4, y=-4, h=8, w=8)
    assert crop.shape == (8, 8, 3)
    assert (crop[:4, :, :] == 0).all() and (crop[:, :4, :] == 0).all()
    assert (crop[4:, 4:, :] == 7).all()
    # fully outside -> all zeros
    crop2 = cz._crop_frame(frame, x=50, y=50, h=8, w=8)
    assert (crop2 == 0).all()


def test_crop_video_dims_and_content(tmp_path):
    import cv2

    video = tmp_path / "in.mp4"
    writer = cv2.VideoWriter(
        str(video), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48)
    )
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, size=(4, 48, 64, 3), dtype=np.uint8)
    for f in frames:
        writer.write(f)
    writer.release()

    bbox = pd.DataFrame(
        {"x": [10] * 4, "y": [8] * 4, "h": [16] * 4, "w": [20] * 4},
        index=pd.Index([f"f{i}" for i in range(4)]),
    )
    bbox_file = tmp_path / "bbox.csv"
    bbox.to_csv(bbox_file)
    out = tmp_path / "out.mp4"
    cz.crop_video(video, bbox_file, out)

    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 20
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 16
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert n == 4


def test_crop_labeled_frames_and_remap(tmp_path):
    import cv2

    data_dir = tmp_path / "data"
    (data_dir / "labeled-data" / "sess").mkdir(parents=True)
    rng = np.random.default_rng(6)
    rel_paths = [f"labeled-data/sess/img{i:03d}.png" for i in range(3)]
    for rel in rel_paths:
        cv2.imwrite(
            str(data_dir / rel),
            rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8),
        )

    cols = pd.MultiIndex.from_tuples(
        [("s", "nose", "x"), ("s", "nose", "y")],
        names=["scorer", "bodyparts", "coords"],
    )
    labels = pd.DataFrame(
        [[30.0, 20.0], [32.0, 22.0], [28.0, 18.0]],
        index=pd.Index(rel_paths), columns=cols,
    )
    csv_file = data_dir / "labels.csv"
    labels.to_csv(csv_file)

    bbox = pd.DataFrame(
        {"x": [10, 12, 8], "y": [6, 8, 4], "h": [20, 20, 20], "w": [24, 24, 24]},
        index=pd.Index(rel_paths),
    )
    bbox_file = tmp_path / "bbox.csv"
    bbox.to_csv(bbox_file)

    out_data = tmp_path / "cropped"
    out_csv = tmp_path / "cropped_labels.csv"
    cz.crop_labeled_frames(data_dir, csv_file, bbox_file, out_data, out_csv)

    for rel in rel_paths:
        img = cv2.imread(str(out_data / rel))
        assert img is not None and img.shape == (20, 24, 3)
    remapped = pd.read_csv(out_csv, header=[0, 1, 2], index_col=0)
    np.testing.assert_allclose(
        remapped[("s", "nose", "x")].to_numpy(),
        labels[("s", "nose", "x")].to_numpy() - bbox["x"].to_numpy(),
    )
    np.testing.assert_allclose(
        remapped[("s", "nose", "y")].to_numpy(),
        labels[("s", "nose", "y")].to_numpy() - bbox["y"].to_numpy(),
    )


def test_crop_labeled_frames_worker_pool_parity(tmp_path):
    """N-worker crop output is bit-identical to the serial path
    (reference cropzoom.py:178-248 uses a multiprocessing pool)."""
    import cv2

    data_dir = tmp_path / "data"
    (data_dir / "labeled-data" / "sess").mkdir(parents=True)
    rng = np.random.default_rng(11)
    rel_paths = [f"labeled-data/sess/img{i:03d}.png" for i in range(12)]
    for rel in rel_paths:
        cv2.imwrite(
            str(data_dir / rel),
            rng.integers(0, 255, size=(40, 56, 3), dtype=np.uint8),
        )
    cols = pd.MultiIndex.from_tuples(
        [("s", "nose", "x"), ("s", "nose", "y")],
        names=["scorer", "bodyparts", "coords"],
    )
    labels = pd.DataFrame(
        rng.uniform(5, 35, size=(12, 2)), index=pd.Index(rel_paths), columns=cols
    )
    csv_file = data_dir / "labels.csv"
    labels.to_csv(csv_file)
    bbox = pd.DataFrame(
        {
            "x": rng.integers(-4, 20, 12),
            "y": rng.integers(-4, 16, 12),
            "h": [18] * 12,
            "w": [22] * 12,
        },
        index=pd.Index(rel_paths),
    )
    bbox_file = tmp_path / "bbox.csv"
    bbox.to_csv(bbox_file)

    outs = {}
    for label, workers in (("serial", 1), ("pool", 4)):
        out_data = tmp_path / f"cropped_{label}"
        out_csv = tmp_path / f"labels_{label}.csv"
        cz.crop_labeled_frames(
            data_dir, csv_file, bbox_file, out_data, out_csv, num_workers=workers
        )
        outs[label] = (out_data, out_csv)

    for rel in rel_paths:
        a = cv2.imread(str(outs["serial"][0] / rel))
        b = cv2.imread(str(outs["pool"][0] / rel))
        assert a is not None and b is not None
        np.testing.assert_array_equal(a, b)
    assert outs["serial"][1].read_text() == outs["pool"][1].read_text()


def test_generate_cropped_csv_roundtrip(tmp_path):
    rel_paths = [f"labeled-data/s/img{i}.png" for i in range(4)]
    cols = pd.MultiIndex.from_tuples(
        [("s", "kp", "x"), ("s", "kp", "y"), ("s", "kp", "likelihood")],
        names=["scorer", "bodyparts", "coords"],
    )
    rng = np.random.default_rng(7)
    labels = pd.DataFrame(
        rng.uniform(0, 100, size=(4, 3)), index=pd.Index(rel_paths), columns=cols
    )
    bbox = pd.DataFrame(
        {"x": [1, 2, 3, 4], "y": [5, 6, 7, 8], "h": [10] * 4, "w": [10] * 4},
        index=pd.Index(rel_paths),
    )
    src = tmp_path / "labels.csv"
    bb = tmp_path / "bbox.csv"
    labels.to_csv(src)
    bbox.to_csv(bb)

    sub = tmp_path / "sub.csv"
    cz.generate_cropped_csv_file(src, bb, sub, mode="subtract")
    back = tmp_path / "back.csv"
    cz.generate_cropped_csv_file(sub, bb, back, mode="add")
    restored = pd.read_csv(back, header=[0, 1, 2], index_col=0)
    np.testing.assert_allclose(restored.to_numpy(), labels.to_numpy(), atol=1e-9)
    # likelihood untouched by the remap
    sub_df = pd.read_csv(sub, header=[0, 1, 2], index_col=0)
    np.testing.assert_allclose(
        sub_df[("s", "kp", "likelihood")].to_numpy(),
        labels[("s", "kp", "likelihood")].to_numpy(),
    )


def test_generate_cropped_csv_aligns_by_index(tmp_path):
    """A bbox CSV whose rows are in a different order than the labels CSV
    must still shift each frame by its OWN bbox corner (index-aligned, the
    reference's pandas-subtraction semantics — not positional)."""
    rel_paths = [f"labeled-data/s/img{i}.png" for i in range(4)]
    cols = pd.MultiIndex.from_tuples(
        [("s", "kp", "x"), ("s", "kp", "y")],
        names=["scorer", "bodyparts", "coords"],
    )
    labels = pd.DataFrame(
        np.arange(8, dtype=float).reshape(4, 2),
        index=pd.Index(rel_paths), columns=cols,
    )
    bbox = pd.DataFrame(
        {"x": [10, 20, 30, 40], "y": [1, 2, 3, 4], "h": [10] * 4,
         "w": [10] * 4},
        index=pd.Index(rel_paths),
    )
    src, bb, out = tmp_path / "l.csv", tmp_path / "b.csv", tmp_path / "o.csv"
    labels.to_csv(src)
    bbox.iloc[::-1].to_csv(bb)  # reversed row order
    cz.generate_cropped_csv_file(src, bb, out, mode="subtract")
    got = pd.read_csv(out, header=[0, 1, 2], index_col=0)
    expected = labels.copy()
    expected[("s", "kp", "x")] -= bbox["x"].to_numpy()
    expected[("s", "kp", "y")] -= bbox["y"].to_numpy()
    np.testing.assert_allclose(got.to_numpy(), expected.to_numpy())


def test_generate_cropped_csv_invalid_mode(tmp_path):
    with pytest.raises(ValueError, match="not a valid mode"):
        cz.generate_cropped_csv_file("a.csv", "b.csv", "c.csv", mode="multiply")


def _write_video(path, n_frames=4, w=64, h=48):
    import cv2

    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h)
    )
    rng = np.random.default_rng(5)
    for f in rng.integers(0, 255, size=(n_frames, h, w, 3), dtype=np.uint8):
        writer.write(f)
    writer.release()


@pytest.mark.parametrize("n_rows", [3, 6])
def test_crop_video_raises_on_bbox_frame_count_mismatch(tmp_path, n_rows):
    """The bbox CSV must be dense — one row per video frame (reference
    test_cropzoom.py:391-427)."""
    video = tmp_path / "in.mp4"
    _write_video(video, n_frames=4)
    bbox = pd.DataFrame(
        {"x": [10] * n_rows, "y": [8] * n_rows,
         "h": [16] * n_rows, "w": [20] * n_rows},
        index=pd.Index([f"f{i}" for i in range(n_rows)]),
    )
    bbox_file = tmp_path / "bbox.csv"
    bbox.to_csv(bbox_file)
    with pytest.raises(ValueError, match="dense"):
        cz.crop_video(video, bbox_file, tmp_path / "out.mp4")


def test_crop_video_output_size_is_even_median(tmp_path):
    """Output dims = median bbox h/w rounded to the nearest even integer
    (reference _crop_video_moviepy)."""
    import cv2

    video = tmp_path / "in.mp4"
    _write_video(video, n_frames=5)
    bbox = pd.DataFrame(
        {"x": [10] * 5, "y": [8] * 5,
         "h": [14, 15, 15, 16, 30], "w": [18, 21, 21, 22, 40]},
        index=pd.Index([f"f{i}" for i in range(5)]),
    )
    bbox_file = tmp_path / "bbox.csv"
    bbox.to_csv(bbox_file)
    out = tmp_path / "out.mp4"
    cz.crop_video(video, bbox_file, out)
    cap = cv2.VideoCapture(str(out))
    # median h=15 -> 16, median w=21 -> round(10.5)*2 = 20 (banker's) or 22
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == round(15 / 2) * 2
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == round(21 / 2) * 2
    cap.release()
