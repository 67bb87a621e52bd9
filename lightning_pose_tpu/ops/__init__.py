"""Fused on-device ops: soft-argmax decode, spatial softmax, preprocessing."""

from lightning_pose_tpu.ops.softargmax import (
    run_subpixelmaxima,
    spatial_expectation2d,
    spatial_softmax2d,
    upsample2x,
)

__all__ = [
    "run_subpixelmaxima",
    "spatial_softmax2d",
    "spatial_expectation2d",
    "upsample2x",
]
