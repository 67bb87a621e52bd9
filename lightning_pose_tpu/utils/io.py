"""Label-CSV parsing, path discovery, and checkpoint discovery.

Behavior-compatible with the reference IO layer (reference
lightning_pose/utils/io.py): DLC 3-row-header CSVs with an optional
per-keypoint ``visible`` column (values 0/1/2), video path discovery and
multi-view grouping by filename, context-frame path derivation, and
best-checkpoint discovery under ``tb_logs/<model_name>/version_*/checkpoints``.

All array outputs are numpy (host data layer); device code receives them as
jnp arrays at the batch boundary.
"""

from __future__ import annotations

import collections
import glob
import logging
import os
import re
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

__all__ = [
    "LabeledData",
    "parse_label_csv",
    "get_keypoint_names",
    "fix_empty_first_row",
    "ckpt_path_from_base_path",
    "return_absolute_path",
    "return_absolute_data_paths",
    "get_videos_in_dir",
    "check_video_paths",
    "collect_video_files_by_view",
    "get_context_img_paths",
    "extract_session_name_from_video",
    "extract_view_name_from_video",
    "split_video_files_by_view",
    "find_video_files_for_views",
    "make_dlc_pandas_index",
]


@dataclass
class LabeledData:
    """Parsed contents of a label CSV (reference utils/io.py:190).

    Attributes:
        keypoint_names: ordered keypoint names.
        image_names: ordered image paths (relative to the project root).
        keypoints: ``(N, K, 2)`` float32 array of (x, y); NaN where unlabeled.
        visibility: ``(N, K)`` int64 array of 0/1/2 flags, or None when the CSV
            has no ``visible`` column.
    """

    keypoint_names: list[str]
    image_names: list[str]
    keypoints: np.ndarray
    visibility: np.ndarray | None


def fix_empty_first_row(df: pd.DataFrame) -> pd.DataFrame:
    """Restore an all-NaN first data row that pandas absorbed as an index name.

    With a multi-row header, pandas treats a first row of all NaNs as the
    index-name row and drops it (reference utils/io.py:529).
    """
    if df.index.name is not None:
        new_row = {col: np.nan for col in df.columns}
        prepend_df = pd.DataFrame(
            new_row, index=pd.Index([df.index.name]), columns=df.columns, dtype="float64"
        )
        fixed_df = pd.concat([prepend_df, df])
        assert fixed_df.index.name is None
        return fixed_df
    return df


def parse_label_csv(csv_file: str, header_rows: list[int] | None = None) -> LabeledData:
    """Parse a DLC-format label CSV in a single read (reference utils/io.py:208).

    Handles the optional per-keypoint ``visible`` column: when present, each
    keypoint contributes (x, y, visible) columns and visibility flags are
    returned; values outside {0, 1, 2} raise.
    """
    if header_rows is None:
        header_rows = [0, 1, 2]
    if not os.path.exists(csv_file):
        raise FileNotFoundError(f"could not find csv file at {csv_file}")

    csv_data = pd.read_csv(csv_file, header=header_rows, index_col=0)
    csv_data = fix_empty_first_row(csv_data)

    if header_rows in ([1, 2], [0, 1]):
        keypoint_names = [b[0] for b in csv_data.columns if b[1] == "x"]
    else:
        keypoint_names = [b[1] for b in csv_data.columns if b[2] == "x"]

    image_names = list(csv_data.index)

    has_vis = header_rows == [0, 1, 2] and any(b[2] == "visible" for b in csv_data.columns)
    raw = csv_data.to_numpy(dtype=np.float32)
    if has_vis:
        raw = raw.reshape(raw.shape[0], -1, 3)
        keypoints = np.ascontiguousarray(raw[:, :, :2])
        vis_float = raw[:, :, 2]
        unique_vals = set(np.unique(vis_float[~np.isnan(vis_float)]).tolist())
        invalid_vals = unique_vals - {0.0, 1.0, 2.0}
        if invalid_vals:
            raise ValueError(
                f"visibility column contains invalid values {invalid_vals}; "
                "expected values in {0, 1, 2}"
            )
        visibility: np.ndarray | None = vis_float.astype(np.int64)
    else:
        keypoints = raw.reshape(raw.shape[0], -1, 2)
        visibility = None

    return LabeledData(
        keypoint_names=keypoint_names,
        image_names=image_names,
        keypoints=keypoints,
        visibility=visibility,
    )


def get_keypoint_names(
    cfg=None,
    csv_file: str | None = None,
    header_rows: list[int] | None = None,
) -> list[str]:
    """Return keypoint names from a label CSV or the config (reference utils/io.py:149)."""
    if header_rows is None:
        header_rows = [0, 1, 2]
    if csv_file is not None and os.path.exists(csv_file):
        csv_data = pd.read_csv(csv_file, header=header_rows, nrows=5)
        if header_rows in ([1, 2], [0, 1]):
            keypoint_names = [b[0] for b in csv_data.columns if b[1] == "x"]
        else:
            keypoint_names = [b[1] for b in csv_data.columns if b[2] == "x"]
    else:
        assert cfg is not None, "cfg must be provided when csv_file is not given"
        if cfg.data.get("keypoint_names", None):
            keypoint_names = list(cfg.data.keypoint_names)
        else:
            keypoint_names = [f"bp_{n}" for n in range(cfg.data.num_keypoints)]
    return keypoint_names


# --------------------------------------------------------------------------------
# checkpoint discovery
# --------------------------------------------------------------------------------


def ckpt_path_from_base_path(
    base_path: str,
    model_name: str,
    logging_dir_name: str = "tb_logs/",
) -> str | None:
    """Locate the checkpoint for a trained model directory (reference utils/io.py:38).

    Prioritizes ``*-best.ckpt`` in the highest ``version_*`` directory, falling
    back to the highest-step checkpoint. Returns None when nothing is found.
    """
    model_search_path = os.path.join(
        base_path,
        logging_dir_name,
        glob.escape(model_name),
        "version_*",
        "checkpoints",
        "*.ckpt",
    )
    all_checkpoint_files = glob.glob(model_search_path)
    if not all_checkpoint_files:
        return None

    ckpt_files_by_version: dict[int, list[str]] = {}
    for f in all_checkpoint_files:
        match = re.search(r"version_(\d+)", f)
        if match:
            ckpt_files_by_version.setdefault(int(match.group(1)), []).append(f)
    if not ckpt_files_by_version:
        return None

    latest_version_files = ckpt_files_by_version[max(ckpt_files_by_version)]
    best_ckpt_files = [
        f for f in latest_version_files if "-best.ckpt" in os.path.basename(f)
    ]

    def _step(f: str) -> int:
        m = re.search(r"step=(\d+)", f)
        return int(m.group(1)) if m else -1

    if len(best_ckpt_files) == 1:
        return best_ckpt_files[0]
    if len(best_ckpt_files) > 1:
        logger.warning(
            f"Multiple 'best' checkpoint files found: {best_ckpt_files}. "
            "Selecting the one with the highest step count."
        )
        return sorted(best_ckpt_files, key=_step)[-1]

    logger.warning("No 'best' checkpoint found, falling back to latest checkpoint.")
    if len(latest_version_files) == 1:
        return latest_version_files[0]
    with_steps = [f for f in latest_version_files if _step(f) >= 0]
    if with_steps:
        return sorted(with_steps, key=_step)[-1]
    raise ValueError(
        "Multiple checkpoint files found but cannot determine which "
        f"to use: {latest_version_files}. "
        "None are marked as 'best' and cannot parse step counts to determine latest. "
        "Please manually select the appropriate checkpoint."
    )


# --------------------------------------------------------------------------------
# path handling
# --------------------------------------------------------------------------------


def return_absolute_path(possibly_relative_path: str, n_dirs_back: int = 3) -> str:
    """Return an absolute path from a possibly relative path (reference utils/io.py:287)."""
    if os.path.isabs(possibly_relative_path):
        abs_path = possibly_relative_path
    else:
        cwd_split = os.getcwd().split(os.path.sep)
        desired_path_list = cwd_split[:-n_dirs_back]
        if desired_path_list and desired_path_list[-1] == "multirun":
            desired_path_list = desired_path_list[:-1]
        abs_path = os.path.join(os.path.sep, *desired_path_list, possibly_relative_path)
    if not os.path.exists(abs_path):
        raise OSError(f"{abs_path} is not a valid path")
    return abs_path


def return_absolute_data_paths(data_cfg, n_dirs_back: int = 3) -> tuple[str, str]:
    """Return absolute (data_dir, video_dir) paths (reference utils/io.py:305)."""
    data_dir = return_absolute_path(data_cfg.data_dir, n_dirs_back=n_dirs_back)
    if os.path.isabs(data_cfg.video_dir):
        video_dir = data_cfg.video_dir
    else:
        video_dir = os.path.join(data_dir, data_cfg.video_dir)
    if not os.path.exists(video_dir):
        raise OSError(f"{video_dir} is not a valid path")
    return data_dir, video_dir


# --------------------------------------------------------------------------------
# video path discovery
# --------------------------------------------------------------------------------


def get_videos_in_dir(
    video_dir: str, view_names: list[str] | None = None, return_mp4_only: bool = True
) -> list[str] | list[list[str]]:
    """Gather video files from a directory (reference utils/io.py:348).

    With ``view_names``, returns a list of per-view lists, validating that all
    views cover the same sessions (filenames ``<vid>_<view>.mp4``).
    """
    assert os.path.isdir(video_dir)
    allowed_formats: tuple[str, ...] | str = (".mp4", ".avi", ".mov")
    if return_mp4_only:
        allowed_formats = ".mp4"
    if view_names:
        all_video_files = sorted(os.listdir(video_dir))
        video_files = [
            [
                os.path.join(video_dir, f)
                for f in all_video_files
                if (
                    f.endswith(allowed_formats)
                    and re.search(rf"(?<![0-9a-zA-Z]){re.escape(view)}(?![0-9a-zA-Z])", f)
                )
            ]
            for view in view_names
        ]
        vid_names = [
            [vid_name.split(f"_{view_names[v]}")[0] for vid_name in video_files_]
            for v, video_files_ in enumerate(video_files)
        ]
        for view, view_files in zip(view_names, video_files):
            if len(view_files) == 0:
                raise OSError(
                    f"Did not find any video files for view '{view}' in {video_dir}. "
                    "Video filenames must contain the view name delimited by "
                    "non-alphanumeric characters, e.g. <vid_name>_<view_name>.mp4."
                )
        for vids_view in vid_names:
            if set(vids_view) != set(vid_names[0]):
                raise RuntimeError(
                    "Mismatched video names across views! Please check your videos are "
                    "in the format <vid_name>_<view_name[0]>, <vid_name>_<view_name[1]>, "
                    "etc., where the `view_name` variable is defined in the config file."
                )
        return video_files

    video_files_flat = [
        os.path.join(video_dir, f)
        for f in os.listdir(video_dir)
        if f.endswith(allowed_formats)
    ]
    if len(video_files_flat) == 0:
        raise OSError(f"Did not find any valid video files in {video_dir}")
    return video_files_flat


def check_video_paths(
    video_paths: list[str] | str, view_names: list[str] | None = None
) -> list[str] | list[list[str]]:
    """Validate/normalize video paths to a flat or per-view nested list
    (reference utils/io.py:423)."""
    if isinstance(video_paths, list):
        filenames = video_paths
    elif isinstance(video_paths, str) and os.path.isfile(video_paths):
        filenames = [video_paths]
    elif isinstance(video_paths, str) and os.path.isdir(video_paths):
        filenames = get_videos_in_dir(video_paths, view_names=view_names)
    else:
        raise ValueError(
            "`video_paths` must be a list of files, a single file, or a directory name"
        )
    for filename in filenames:
        fs = [filename] if isinstance(filename, (str, Path)) else filename
        for f in fs:
            assert str(f).endswith(".mp4"), "video files must be mp4 format!"
    return filenames


def collect_video_files_by_view(
    video_files: list[Path], view_names: list[str]
) -> dict[str, Path]:
    """Match exactly one video file per view by filename (reference utils/io.py:467)."""
    assert len(video_files) == len(view_names), f"{len(video_files)} != {len(view_names)}"
    video_files_by_view: dict[str, Path] = {}
    for view_name in view_names:
        for video_file in video_files:
            if re.search(
                rf"(?<![0-9a-zA-Z]){re.escape(view_name)}(?![0-9a-zA-Z])",
                Path(video_file).stem,
            ):
                if view_name not in video_files_by_view:
                    video_files_by_view[view_name] = Path(video_file)
                else:
                    raise ValueError(f"File matches multiple views: {video_file}")
        if view_name not in video_files_by_view:
            raise ValueError(f"File not found for view: {view_name}")
    return video_files_by_view


def get_context_img_paths(center_img_path: Path) -> list[Path]:
    """Return the 5 context-frame paths (n-2..n+2, floored at 0) for a center
    frame (reference utils/io.py:497)."""
    center_img_path = Path(center_img_path)
    match = re.search(r"(\d+)", center_img_path.stem)
    assert match is not None, (
        f"No frame index in filename, can't get context frames: {center_img_path.name}"
    )
    center_index_string = match.group()
    center_index = int(center_index_string)

    context_img_paths = []
    for index in range(center_index - 2, center_index + 3):
        index = max(index, 0)
        index_string = str(index).zfill(len(center_index_string))
        stem = center_img_path.stem.replace(center_index_string, index_string)
        path = center_img_path.with_name(stem + center_img_path.suffix)
        context_img_paths.append(path)
    return context_img_paths


def extract_session_name_from_video(video_filename: str, view_names: list[str]) -> str:
    """Strip the view name from a video filename (reference utils/io.py:557)."""
    name_without_ext = Path(video_filename).stem
    for view_name in view_names:
        if view_name in name_without_ext:
            return name_without_ext.replace(f"_{view_name}", "")
    return name_without_ext


def extract_view_name_from_video(
    video_filename: str, view_names: list[str]
) -> str | None:
    """Return the view name contained in a video filename, or None."""
    for view_name in view_names:
        if view_name in Path(video_filename).stem:
            return view_name
    return None


def split_video_files_by_view(
    video_paths: list[Path], view_names: list[str]
) -> list[list[Path]]:
    """Group videos into per-session lists ordered by view (reference utils/io.py:594)."""
    session_view_video_map: dict[str, dict[str, Path]] = collections.defaultdict(dict)
    for video_path in video_paths:
        video_path = Path(video_path)
        view = extract_view_name_from_video(video_path.name, view_names)
        if view is not None:
            session = extract_session_name_from_video(video_path.name, view_names)
            session_view_video_map[session][view] = video_path

    video_views_per_session = []
    for view_to_video_path in session_view_video_map.values():
        if any(v not in view_to_video_path for v in view_names):
            continue
        video_views_per_session.append([view_to_video_path[v] for v in view_names])
    return video_views_per_session


def find_video_files_for_views(video_dir: str, view_names: list[str]) -> list[list[Path]]:
    """Discover and group per-session/per-view videos in a directory
    (reference utils/io.py:635)."""
    video_dir_path = Path(video_dir)
    if not video_dir_path.exists():
        raise FileNotFoundError(f"Video directory not found: {video_dir}")
    all_video_files = list(video_dir_path.glob("*.mp4"))
    if not all_video_files:
        raise FileNotFoundError(f"No video files found in {video_dir}")
    return split_video_files_by_view(all_video_files, view_names)


# --------------------------------------------------------------------------------
# prediction dataframe index
# --------------------------------------------------------------------------------


def make_dlc_pandas_index(cfg, keypoint_names: list[str]) -> pd.MultiIndex:
    """Build the DLC 3-level (scorer, bodyparts, coords) column MultiIndex
    (reference utils/predictions.py:538)."""
    xyl_labels = ["x", "y", "likelihood"]
    pdindex = pd.MultiIndex.from_product(
        [[f"{cfg.model.model_type}_tracker"], keypoint_names, xyl_labels],
        names=["scorer", "bodyparts", "coords"],
    )
    return pdindex
