"""``litpose crop`` (reference lightning_pose/cli/commands/crop.py:19-160)."""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any

NAME = "crop"


def register_parser(subparsers: Any) -> argparse.ArgumentParser:
    p = subparsers.add_parser(
        NAME,
        description=(
            "Crop a video or labeled frames using pre-computed bounding boxes "
            "(run `litpose create_bbox` first)."
        ),
    )
    p.add_argument("input_path", type=Path, help="video file or labels CSV")
    p.add_argument("bbox_file", type=Path, help="bbox CSV file")
    p.add_argument("--data_dir", type=Path, default=None,
                   help="root directory of labeled images (CSV mode)")
    p.add_argument("--output_path", type=Path, default=None)
    return p


def handle(args: argparse.Namespace) -> None:
    from lightning_pose_tpu.utils import cropzoom as cz

    if args.input_path.suffix == ".mp4":
        out = args.output_path or args.input_path.with_name(
            "cropped_" + args.input_path.name
        )
        cz.crop_video(args.input_path, args.bbox_file, out)
        print(f"wrote {out}")
    elif args.input_path.suffix == ".csv":
        data_dir = args.data_dir or args.input_path.parent
        out_csv = args.output_path or args.input_path.with_name(
            "cropped_" + args.input_path.name
        )
        out_data_dir = Path(str(data_dir) + "_cropped")
        cz.crop_labeled_frames(
            input_data_dir=data_dir,
            input_csv_file=args.input_path,
            input_bbox_file=args.bbox_file,
            output_data_dir=out_data_dir,
            output_csv_file=out_csv,
        )
        print(f"wrote {out_csv} and cropped images to {out_data_dir}")
    else:
        raise ValueError(f"unsupported input type: {args.input_path}")
