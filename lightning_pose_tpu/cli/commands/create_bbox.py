"""``litpose create_bbox``
(reference lightning_pose/cli/commands/create_bbox.py:21-160)."""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any

NAME = "create_bbox"


def register_parser(subparsers: Any) -> argparse.ArgumentParser:
    p = subparsers.add_parser(
        NAME,
        description=(
            "Compute per-frame bounding boxes from detector-model predictions "
            "(first stage of the cropzoom pipeline)."
        ),
    )
    p.add_argument("pred_file", type=Path, nargs="+", help="prediction CSV file(s)")
    p.add_argument(
        "--anchor_keypoints", nargs="*", default=[],
        help="keypoints used for the bbox center/span (default: all)",
    )
    p.add_argument("--crop_ratio", type=float, default=None)
    p.add_argument("--crop_height", type=int, default=None)
    p.add_argument("--crop_width", type=int, default=None)
    p.add_argument("--output_dir", type=Path, default=None)
    return p


def handle(args: argparse.Namespace) -> None:
    from lightning_pose_tpu.config import Config
    from lightning_pose_tpu.utils import cropzoom as cz

    detector_cfg = Config(
        {
            "anchor_keypoints": list(args.anchor_keypoints),
            "crop_ratio": args.crop_ratio,
            "crop_height": args.crop_height,
            "crop_width": args.crop_width,
        }
    )
    if args.crop_ratio is None and args.crop_height is None:
        detector_cfg.crop_ratio = 1.5  # sensible default
    for pred_file in args.pred_file:
        out_dir = args.output_dir or pred_file.parent
        out_file = Path(out_dir) / (pred_file.stem + "_bbox.csv")
        cz.generate_bbox(pred_file, detector_cfg, out_file)
        print(f"wrote {out_file}")
