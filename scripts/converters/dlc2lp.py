"""Convert a DeepLabCut project to the Lightning Pose layout
(reference scripts/converters/dlc2lp.py).

Usage: python scripts/converters/dlc2lp.py --dlc_dir <dlc> --lp_dir <lp>

Collects all per-video ``CollectedData*.csv`` files under
``<dlc_dir>/labeled-data/``, normalizes the new split video/image index
format, concatenates into a single ``CollectedData.csv``, and copies the
labeled frames and videos into the LP directory structure.
"""

import argparse
import glob
import os
import shutil

import numpy as np
import pandas as pd


def fix_empty_first_row(df: pd.DataFrame) -> pd.DataFrame:
    if df.index.name is not None:
        new_row = {col: np.nan for col in df.columns}
        prepend_df = pd.DataFrame(
            new_row, index=[df.index.name], columns=df.columns, dtype="float64"
        )
        fixed_df = pd.concat([prepend_df, df])
        assert fixed_df.index.name is None
        return fixed_df
    return df


def _normalize_index(df: pd.DataFrame) -> pd.DataFrame:
    """Handle the newer DLC format that splits video/image across cells."""
    if len(df.index.unique()) != df.shape[0]:
        vids = df.loc[:, ("Unnamed: 1_level_0", "Unnamed: 1_level_1", "Unnamed: 1_level_2")]
        imgs = df.loc[:, ("Unnamed: 2_level_0", "Unnamed: 2_level_1", "Unnamed: 2_level_2")]
        new_col = [f"labeled-data/{v}/{i}" for v, i in zip(vids, imgs)]
        df = df.drop(
            columns=[
                ("Unnamed: 1_level_0", "Unnamed: 1_level_1", "Unnamed: 1_level_2"),
                ("Unnamed: 2_level_0", "Unnamed: 2_level_1", "Unnamed: 2_level_2"),
            ]
        )
        df.index = pd.Index(new_col)
    return df


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dlc_dir", type=str, required=True)
    parser.add_argument("--lp_dir", type=str, required=True)
    args = parser.parse_args()
    dlc_dir, lp_dir = args.dlc_dir, args.lp_dir

    if not os.path.exists(dlc_dir):
        raise NotADirectoryError(f"did not find the directory {dlc_dir}")
    if dlc_dir == lp_dir:
        raise NameError("dlc_dir and lp_dir cannot be the same")
    print(f"Converting DLC project at {dlc_dir} to LP project at {lp_dir}")

    dirs = sorted(
        d
        for d in os.listdir(os.path.join(dlc_dir, "labeled-data"))
        if not d.startswith(".") and not d.endswith("_labeled")
    )
    dfs = []
    for d in dirs:
        candidates = glob.glob(
            os.path.join(dlc_dir, "labeled-data", d, "CollectedData*.csv")
        )
        if not candidates:
            h5s = glob.glob(os.path.join(dlc_dir, "labeled-data", d, "CollectedData*.h5"))
            if not h5s:
                print(f"skipping {d}: no CollectedData files")
                continue
            df_tmp = pd.read_hdf(h5s[0])
        else:
            df_tmp = pd.read_csv(candidates[0], header=[0, 1, 2], index_col=0)
            df_tmp = fix_empty_first_row(df_tmp)
            df_tmp = _normalize_index(df_tmp)
        dfs.append(df_tmp)
        # copy frames
        src_frames = os.path.join(dlc_dir, "labeled-data", d)
        dst_frames = os.path.join(lp_dir, "labeled-data", d)
        os.makedirs(dst_frames, exist_ok=True)
        for f in os.listdir(src_frames):
            if f.endswith((".png", ".jpg", ".jpeg")):
                shutil.copy(os.path.join(src_frames, f), os.path.join(dst_frames, f))

    if not dfs:
        raise RuntimeError("no labeled data found")
    df_all = pd.concat(dfs)
    os.makedirs(lp_dir, exist_ok=True)
    df_all.to_csv(os.path.join(lp_dir, "CollectedData.csv"))

    # copy videos
    src_videos = os.path.join(dlc_dir, "videos")
    if os.path.isdir(src_videos):
        dst_videos = os.path.join(lp_dir, "videos")
        os.makedirs(dst_videos, exist_ok=True)
        for f in os.listdir(src_videos):
            if f.endswith(".mp4"):
                shutil.copy(os.path.join(src_videos, f), os.path.join(dst_videos, f))
    print(f"done: {len(df_all)} labeled frames -> {lp_dir}/CollectedData.csv")


if __name__ == "__main__":
    main()
