"""``litpose export`` (reference lightning_pose/cli/commands/export.py:24-90).

The reference exports ONNX; the TPU-native analog serializes the jitted
XLA program via ``jax.export``.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any

NAME = "export"


def register_parser(subparsers: Any) -> argparse.ArgumentParser:
    p = subparsers.add_parser(
        NAME, description="Export a trained model as a serialized XLA program."
    )
    from lightning_pose_tpu.cli import types as cli_types

    p.add_argument(
        "model_dir", type=cli_types.existing_model_dir,
        help="trained model directory",
    )
    p.add_argument("--output_dir", type=Path, default=None)
    return p


def handle(args: argparse.Namespace) -> None:
    from lightning_pose_tpu.api.model import Model

    model = Model.from_dir(args.model_dir)
    path = model.export(output_dir=args.output_dir)
    print(f"exported to {path}")
