"""Cropzoom: the two-stage detector -> pose workflow
(reference lightning_pose/utils/cropzoom.py:40-489).

Pipeline: predict with a detector model -> ``generate_bbox`` (square bbox
from the anchor-keypoint span, crop_ratio or fixed size, even dims) ->
``smooth_bbox`` (rolling median) -> ``crop_video`` / ``crop_labeled_frames``
(cv2/PIL instead of the reference's moviepy) -> ``generate_cropped_csv_file``
(add/subtract coordinate remap).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import cv2
import numpy as np
import pandas as pd

from lightning_pose_tpu.utils import io

logger = logging.getLogger(__name__)

__all__ = [
    "generate_bbox",
    "smooth_bbox",
    "crop_video",
    "crop_labeled_frames",
    "generate_cropped_csv_file",
]


def _round_up_to_even(values):
    """Even dimensions keep video players happy."""
    return values + values % 2


def _calculate_bbox_size(keypoints_per_frame: np.ndarray, crop_ratio: float) -> np.ndarray:
    """Square bbox size per frame from the keypoint span x crop_ratio,
    rounded up to even (reference cropzoom.py:40-62). NaN keypoints are
    ignored (divergence: the reference propagates them)."""
    spans = np.nanmax(keypoints_per_frame, axis=1) - np.nanmin(
        keypoints_per_frame, axis=1
    )  # (frames, 2): per-axis extent of the animal
    side = _round_up_to_even(
        np.ceil(spans.max(axis=1) * crop_ratio).astype(int)
    )
    return np.repeat(side[:, None], 2, axis=1)


def _anchor_coords(pred_df: pd.DataFrame, anchor_keypoints: list[str]) -> np.ndarray:
    """(frames, keypoints, 2) coordinate array restricted to the anchor
    keypoints (all keypoints when the anchor list is empty)."""
    columns = pred_df.columns
    keep = columns.get_level_values("coords").isin(["x", "y"])
    if anchor_keypoints:
        known = set(columns.get_level_values("bodyparts"))
        invalid = set(anchor_keypoints) - known
        assert not invalid, f"Anchor keypoints not found in DataFrame: {invalid}"
        keep &= columns.get_level_values("bodyparts").isin(anchor_keypoints)
    return pred_df.loc[:, keep].to_numpy().reshape(len(pred_df), -1, 2)


def _compute_bbox_df(
    pred_df: pd.DataFrame,
    anchor_keypoints: list[str],
    crop_ratio: float | None = None,
    crop_height: int | None = None,
    crop_width: int | None = None,
) -> pd.DataFrame:
    """Bbox DataFrame [x, y, h, w] per frame (reference cropzoom.py:65-143).

    The box is centred on the per-frame centroid of the anchor keypoints and
    sized either by scaling the keypoint span (``crop_ratio``) or to a fixed
    ``(crop_height, crop_width)``. Exactly one sizing mode must be given.
    """
    fixed_size_mode = crop_height is not None and crop_width is not None
    if fixed_size_mode and crop_ratio is not None:
        raise ValueError(
            "provide either crop_ratio or (crop_height, crop_width), not both."
        )
    if not fixed_size_mode and crop_ratio is None:
        raise ValueError(
            "one of crop_ratio or (crop_height, crop_width) must be provided."
        )

    coords = _anchor_coords(pred_df, anchor_keypoints)
    if fixed_size_mode:
        hw = [_round_up_to_even(crop_height), _round_up_to_even(crop_width)]
        sizes = np.tile(hw, (len(pred_df), 1))
    else:
        sizes = _calculate_bbox_size(coords, crop_ratio=crop_ratio)
    top_left = np.int64(np.nanmean(coords, axis=1) - sizes // 2)
    return pd.DataFrame(
        np.concatenate([top_left, sizes], axis=1),
        index=pd.Index(pred_df.index),
        columns=pd.Index(["x", "y", "h", "w"]),
    )


def generate_bbox(
    input_preds_file: Path,
    detector_cfg,
    output_bbox_file: Path,
) -> None:
    """Compute bboxes from predictions and save (reference cropzoom.py:328)."""
    pred_df = pd.read_csv(input_preds_file, header=[0, 1, 2], index_col=0)
    pred_df = io.fix_empty_first_row(pred_df)
    bbox_df = _compute_bbox_df(
        pred_df,
        list(detector_cfg.anchor_keypoints),
        crop_ratio=detector_cfg.get("crop_ratio"),
        crop_height=detector_cfg.get("crop_height"),
        crop_width=detector_cfg.get("crop_width"),
    )
    Path(output_bbox_file).parent.mkdir(parents=True, exist_ok=True)
    bbox_df.to_csv(output_bbox_file)


def smooth_bbox(
    input_bbox_dir: Path,
    output_dir: Path,
    method: str = "median",
    window: int = 5,
) -> None:
    """Rolling-median smoothing of bbox CSVs (reference cropzoom.py:355)."""
    input_bbox_dir = Path(input_bbox_dir)
    output_dir = Path(output_dir)
    if method not in ("median",):
        raise ValueError(f"unsupported method {method!r}; choose one of ('median',).")
    bbox_files = sorted(input_bbox_dir.glob("*_bbox.csv"))
    if not bbox_files:
        raise ValueError(f"no *_bbox.csv files found in {input_bbox_dir}.")
    output_dir.mkdir(parents=True, exist_ok=True)
    for bbox_file in bbox_files:
        bbox_df = pd.read_csv(bbox_file, index_col=0)
        smoothed = bbox_df.rolling(window=window, center=True, min_periods=1).median()
        smoothed = smoothed.round(0).astype(int)
        smoothed.to_csv(output_dir / bbox_file.name)
        logger.info(f"smoothed {bbox_file.name} -> {output_dir / bbox_file.name}")
    metadata = {
        "method": method,
        "window": window,
        "source": str(input_bbox_dir.resolve()),
    }
    (output_dir / "metadata.json").write_text(json.dumps(metadata, indent=2))


def _crop_frame(frame: np.ndarray, x: int, y: int, h: int, w: int) -> np.ndarray:
    """Crop with zero padding when the bbox extends past the frame edges."""
    fh, fw = frame.shape[:2]
    out = np.zeros((h, w, frame.shape[2]), dtype=frame.dtype)
    x0, y0 = max(x, 0), max(y, 0)
    x1, y1 = min(x + w, fw), min(y + h, fh)
    if x1 > x0 and y1 > y0:
        out[y0 - y:y1 - y, x0 - x:x1 - x] = frame[y0:y1, x0:x1]
    return out


def crop_video(
    input_video_file: Path,
    input_bbox_file: Path,
    output_file: Path,
) -> None:
    """Crop a video to per-frame bboxes (cv2; reference cropzoom.py:405 uses
    moviepy)."""
    bbox_df = pd.read_csv(input_bbox_file, index_col=0)
    Path(output_file).parent.mkdir(parents=True, exist_ok=True)
    cap = cv2.VideoCapture(str(input_video_file))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    # the bbox CSV must be dense: one row per frame, no gaps
    # (reference cropzoom.py:_crop_video_moviepy raises on mismatch)
    n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if len(bbox_df) != n_frames:
        cap.release()
        raise ValueError(
            f"{Path(input_video_file).name}: bbox CSV has {len(bbox_df)} rows "
            f"but video has {n_frames} frames. The video bbox CSV must be "
            f"dense: exactly one row per frame with no gaps. If your tracking "
            f"has missing frames, carry the last known bbox forward to fill "
            f"the gap."
        )
    # output size = median bbox dims rounded to nearest even integer
    # (reference cropzoom.py: h/w median, round(x/2)*2)
    h0 = int(round(float(bbox_df["h"].median()) / 2) * 2)
    w0 = int(round(float(bbox_df["w"].median()) / 2) * 2)
    writer = cv2.VideoWriter(
        str(output_file), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w0, h0)
    )
    for _, row in bbox_df.iterrows():
        ret, frame = cap.read()
        if not ret:
            break
        crop = _crop_frame(
            frame, int(row["x"]), int(row["y"]), int(row["h"]), int(row["w"])
        )
        if crop.shape[:2] != (h0, w0):
            crop = cv2.resize(crop, (w0, h0))
        writer.write(crop)
    cap.release()
    writer.release()


def crop_labeled_frames(
    input_data_dir: Path,
    input_csv_file: Path,
    input_bbox_file: Path,
    output_data_dir: Path,
    output_csv_file: Path,
    num_workers: int | None = None,
) -> None:
    """Crop labeled frames + remap the labels CSV (reference cropzoom.py:423).

    Frames crop in a thread pool (cv2 releases the GIL in imread/imwrite;
    the reference uses a multiprocessing pool, reference
    cropzoom.py:178-248). ``num_workers`` defaults to ``min(8, cores)``.
    """
    import concurrent.futures as cf
    import os

    input_data_dir = Path(input_data_dir)
    output_data_dir = Path(output_data_dir)
    bbox_df = pd.read_csv(input_bbox_file, index_col=0)
    output_data_dir.mkdir(parents=True, exist_ok=True)

    def crop_one(item):
        img_rel, row = item
        img_path = input_data_dir / str(img_rel)
        img = cv2.imread(str(img_path))
        if img is None:
            logger.warning(f"could not read {img_path}; skipping")
            return
        crop = _crop_frame(
            img, int(row["x"]), int(row["y"]), int(row["h"]), int(row["w"])
        )
        out_path = output_data_dir / str(img_rel)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(out_path), crop)

    workers = num_workers or max(1, min(8, os.cpu_count() or 1))
    if workers <= 1:
        for item in bbox_df.iterrows():
            crop_one(item)
    else:
        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(crop_one, bbox_df.iterrows()))
    generate_cropped_csv_file(
        input_csv_file=input_csv_file,
        input_bbox_file=input_bbox_file,
        output_csv_file=output_csv_file,
    )


def generate_cropped_csv_file(
    input_csv_file: str | Path,
    input_bbox_file: str | Path,
    output_csv_file: str | Path,
    mode: str = "subtract",
) -> None:
    """Add/subtract bbox offsets from CSV coordinates
    (reference cropzoom.py:450-489)."""
    if mode not in ("add", "subtract"):
        raise ValueError(f"{mode} is not a valid mode")
    csv_data = pd.read_csv(input_csv_file, header=[0, 1, 2], index_col=0)
    csv_data = io.fix_empty_first_row(csv_data)
    bbox_data = pd.read_csv(input_bbox_file, index_col=0)
    for col in csv_data.columns:
        if col[-1] in ("x", "y"):
            if mode == "subtract":
                csv_data[col] = csv_data[col] - bbox_data[col[-1]]
            else:
                csv_data[col] = csv_data[col] + bbox_data[col[-1]]
    output_csv_file = Path(output_csv_file)
    output_csv_file.parent.mkdir(parents=True, exist_ok=True)
    csv_data.to_csv(output_csv_file)
