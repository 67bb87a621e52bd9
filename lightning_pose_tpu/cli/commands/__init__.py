"""CLI subcommand registry (reference lightning_pose/cli/commands/__init__.py:6-15)."""

from lightning_pose_tpu.cli.commands import (
    create_bbox,
    crop,
    export,
    predict,
    remap,
    run_app,
    smooth_bbox,
    train,
)

COMMANDS = [
    train,
    predict,
    export,
    create_bbox,
    smooth_bbox,
    crop,
    remap,
    run_app,
]
