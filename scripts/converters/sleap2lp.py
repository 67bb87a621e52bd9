"""Convert a SLEAP project (.pkg.slp) to the Lightning Pose layout
(reference scripts/converters/sleap2lp.py).

Usage: python scripts/converters/sleap2lp.py --slp_file <file> --lp_dir <dir>

Requires the optional ``sleap-io`` package to read .slp files; extracts
labeled frames as PNGs and writes a DLC-format CollectedData.csv.
"""

import argparse
import os

import numpy as np
import pandas as pd


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--slp_file", type=str, required=True)
    parser.add_argument("--lp_dir", type=str, required=True)
    args = parser.parse_args()

    try:
        import sleap_io
    except ImportError:
        raise SystemExit(
            "sleap2lp requires the `sleap-io` package: pip install sleap-io"
        )
    import cv2

    labels = sleap_io.load_slp(args.slp_file)
    skeleton = labels.skeletons[0]
    keypoint_names = [node.name for node in skeleton.nodes]

    frames_dir = os.path.join(args.lp_dir, "labeled-data")
    os.makedirs(frames_dir, exist_ok=True)

    rows = []
    index = []
    for i, lf in enumerate(labels.labeled_frames):
        if not lf.instances:
            continue
        img = lf.image
        if img is None:
            continue
        name = f"labeled-data/img{i:06d}.png"
        out_path = os.path.join(args.lp_dir, name)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        cv2.imwrite(out_path, cv2.cvtColor(np.asarray(img), cv2.COLOR_RGB2BGR))
        inst = lf.instances[0]
        coords = np.full((len(keypoint_names), 2), np.nan)
        for j, node in enumerate(skeleton.nodes):
            point = inst[node]
            if point is not None and not np.isnan(point.x):
                coords[j] = [point.x, point.y]
        rows.append(coords.reshape(-1))
        index.append(name)

    cols = pd.MultiIndex.from_product(
        [["sleap"], keypoint_names, ["x", "y"]],
        names=["scorer", "bodyparts", "coords"],
    )
    df = pd.DataFrame(np.stack(rows), index=pd.Index(index), columns=cols)
    df.to_csv(os.path.join(args.lp_dir, "CollectedData.csv"))
    print(f"done: {len(df)} labeled frames -> {args.lp_dir}/CollectedData.csv")


if __name__ == "__main__":
    main()
