"""Model factory: (model_type, semi_supervised) -> tracker module
(reference lightning_pose/models/factory.py:48-231).

Unlike the reference's 8 LightningModule classes (4 model types x
{supervised, semi-supervised}), the TPU build has one Flax module per model
type; semi-supervision is a property of the training step, decided by
``cfg.model.losses_to_use`` (reference models/base.py:38-56 predicate).
"""

from __future__ import annotations

import logging
from typing import Any

import jax.numpy as jnp

from lightning_pose_tpu.models.heatmap_tracker import HeatmapTracker
from lightning_pose_tpu.models.regression_tracker import RegressionTracker

logger = logging.getLogger(__name__)

__all__ = [
    "ALLOWED_MODEL_TYPES",
    "check_if_semi_supervised",
    "get_model_class",
    "get_model",
    "normalize_model_type",
]

# "heatmap_multiview_transformer" is the reference's canonical config value
# (reference models/factory.py:48-53); "heatmap_multiview" is accepted as a
# short alias and used as the internal canonical name in saved metadata.
ALLOWED_MODEL_TYPES = [
    "regression",
    "heatmap",
    "heatmap_mhcrnn",
    "heatmap_multiview_transformer",
    "heatmap_multiview",
]

_MODEL_TYPE_ALIASES = {"heatmap_multiview_transformer": "heatmap_multiview"}


def normalize_model_type(model_type: str) -> str:
    """Map config model_type strings to the internal canonical name."""
    return _MODEL_TYPE_ALIASES.get(model_type, model_type)


def check_if_semi_supervised(losses_to_use) -> bool:
    """True when unsupervised losses are configured
    (reference models/base.py:38-56)."""
    if losses_to_use is None:
        return False
    losses = list(losses_to_use)
    if len(losses) == 0:
        return False
    if len(losses) == 1 and losses[0] == "":
        return False
    return True


def get_model_class(map_type: str, semi_supervised: bool = False):
    """Resolve a model-type string to a module class."""
    map_type = normalize_model_type(map_type)
    if map_type not in ALLOWED_MODEL_TYPES:
        raise NotImplementedError(
            f"{map_type} is an invalid model_type; choose from {ALLOWED_MODEL_TYPES}"
        )
    if map_type == "regression":
        return RegressionTracker
    if map_type == "heatmap":
        return HeatmapTracker
    if map_type == "heatmap_mhcrnn":
        from lightning_pose_tpu.models.heatmap_tracker_mhcrnn import (
            HeatmapTrackerMHCRNN,
        )

        return HeatmapTrackerMHCRNN
    if map_type == "heatmap_multiview":
        from lightning_pose_tpu.models.heatmap_tracker_multiview import (
            HeatmapTrackerMultiviewTransformer,
        )

        return HeatmapTrackerMultiviewTransformer
    raise NotImplementedError


def get_model(
    cfg,
    num_keypoints: int | None = None,
    compute_dtype: Any = jnp.bfloat16,
):
    """Build the tracker module described by the config.

    Returns:
        (module, metadata dict) — metadata carries model_type,
        semi_supervised flag, and downsample_factor for the training loop.
    """
    model_type = normalize_model_type(cfg.model.model_type)
    semi_supervised = check_if_semi_supervised(cfg.model.get("losses_to_use"))
    num_keypoints = num_keypoints or cfg.data.num_keypoints
    image_size = int(cfg.data.image_resize_dims.get("height") or 256)
    downsample_factor = int(cfg.data.get("downsample_factor", 2))

    cls = get_model_class(model_type, semi_supervised)
    kwargs: dict[str, Any] = dict(
        backbone_arch=cfg.model.backbone,
        num_keypoints=num_keypoints,
        image_size=image_size,
        dtype=compute_dtype,
    )
    if model_type != "regression":
        kwargs["downsample_factor"] = downsample_factor
    if model_type == "heatmap_multiview":
        kwargs["num_views"] = len(cfg.data.get("view_names") or [])
    if model_type == "heatmap_mhcrnn":
        # repeat-center stacks are 5 copies of one frame — the tracker
        # encodes the center once and tiles features (exact-equal outputs,
        # ~5x fewer backbone FLOPs; see heatmap_tracker_mhcrnn.py)
        kwargs["context_repeat"] = (
            cfg.model.get("mhcrnn_context_mode", "adjacent") == "repeat_center"
        )

    module = cls(**kwargs)
    # heatmap/mhcrnn trackers on multiview data fold views into the batch
    # (reference models/base.py:296-343); num_keypoints stays per-view, but
    # the training loop needs the view count for target/bbox layouts
    num_views = kwargs.get("num_views", 1)
    if model_type in ("heatmap", "heatmap_mhcrnn"):
        view_names = cfg.data.get("view_names") or []
        if len(view_names) > 1:
            num_views = len(view_names)
    meta = {
        "model_type": model_type,
        "semi_supervised": semi_supervised,
        "downsample_factor": downsample_factor,
        "num_keypoints": num_keypoints,
        "image_size": image_size,
        "num_views": num_views,
    }
    return module, meta
