"""Temporal-context tracker (MHCRNN)
(reference lightning_pose/models/heatmap_tracker_mhcrnn.py:30-332).

Labeled forward consumes 5-frame context stacks; unlabeled video sequences
are tiled into sliding 5-frame windows with edge padding (reference
models/base.py:151-188) by :func:`make_context_windows`. Training doubles
the batch by concatenating single-frame and multi-frame head outputs
(reference heatmap_tracker_mhcrnn.py:154-174); prediction merges the two
heads per keypoint by confidence (reference :210-216).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from lightning_pose_tpu.models.backbones.factory import build_backbone
from lightning_pose_tpu.models.heads.heatmap_mhcrnn import HeatmapMHCRNNHead
from lightning_pose_tpu.ops.softargmax import run_subpixelmaxima

__all__ = [
    "HeatmapTrackerMHCRNN",
    "make_context_windows",
    "repeat_center_stack",
    "merge_heads_by_confidence",
]


def make_context_windows(
    frames: jax.Array, repeat_center: bool = False
) -> jax.Array:
    """Tile a ``(T, H, W, C)`` sequence into ``(T-4, 5, H, W, C)`` sliding
    windows (reference base.py:151-188 sequence tiling; edge frames are
    dropped, matching the shift-by-2 fix downstream).

    ``repeat_center=True`` fills each window with 5 copies of its center
    frame instead — train/inference consistency for models trained with
    ``model.mhcrnn_context_mode=repeat_center`` (such a model's MF head
    has never seen varying context; feeding it real temporal windows
    measured 21.4 px test vs 4.25 px with repeated centers on
    mirror-mouse — see docs/architecture.md)."""
    t = frames.shape[0]
    if t < 5:
        raise ValueError(
            f"context windows need at least 5 frames, got a sequence of {t}"
        )
    if repeat_center:
        centers = frames[2:t - 2]
        return jnp.repeat(centers[:, None], 5, axis=1)
    windows = [frames[i:i + 5] for i in range(t - 4)]
    return jnp.stack(windows, axis=0)


def repeat_center_stack(stacks: jax.Array, time_axis: int) -> jax.Array:
    """Normalize pre-windowed context stacks to 5 copies of each window's
    center frame along ``time_axis`` (the repeat_center invariant: window
    length 5, center index 2 — kept in one place; the MF head hard-codes
    the same center, heads/heatmap_mhcrnn.py)."""
    center = jax.lax.index_in_dim(stacks, 2, axis=time_axis, keepdims=True)
    return jnp.repeat(center, 5, axis=time_axis)


def merge_heads_by_confidence(
    kp_sf: jax.Array, conf_sf: jax.Array, kp_mf: jax.Array, conf_mf: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Per-keypoint pick of the higher-confidence head
    (reference heatmap_tracker_mhcrnn.py:210-216)."""
    take_mf = conf_mf >= conf_sf  # (B, K)
    kp_sf2 = kp_sf.reshape(kp_sf.shape[0], -1, 2)
    kp_mf2 = kp_mf.reshape(kp_mf.shape[0], -1, 2)
    kp = jnp.where(take_mf[..., None], kp_mf2, kp_sf2)
    conf = jnp.maximum(conf_sf, conf_mf)
    return kp.reshape(kp_sf.shape), conf


def _unfold_view_channels(heatmaps: jax.Array, b: int, v: int) -> jax.Array:
    """(B*V, h, w, K) per-view heatmaps -> (B, h, w, V*K) view-major
    channels (matching the multiview datasets' keypoint layout)."""
    bv, h, w, k = heatmaps.shape
    return (
        heatmaps.reshape(b, v, h, w, k)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b, h, w, v * k)
    )


class HeatmapTrackerMHCRNN(nn.Module):
    """images (B, 5, H, W, 3) -> (heatmaps_sf, heatmaps_mf)."""

    backbone_arch: str = "resnet50"
    num_keypoints: int = 17
    downsample_factor: int = 2  # df=2 only (reference :64)
    deconv_out_channels: int | None = None
    image_size: int = 256
    dtype: Any = jnp.bfloat16
    # model.mhcrnn_context_mode=repeat_center: stacks are 5 copies of the
    # center frame, so encode the center ONCE and tile its features over
    # the time axis — exact-equal heads input (duplicating samples changes
    # neither batch-norm statistics nor per-frame features) at ~1/5 the
    # backbone FLOPs in training, eval, and video inference
    context_repeat: bool = False

    def setup(self) -> None:
        if self.downsample_factor != 2:
            raise ValueError("heatmap_mhcrnn only supports downsample_factor=2")
        backbone, num_features, _ = build_backbone(
            self.backbone_arch,
            model_type="heatmap",
            image_size=self.image_size,
            dtype=self.dtype,
        )
        self.backbone = backbone
        self.head = HeatmapMHCRNNHead(
            backbone_arch=self.backbone_arch,
            in_channels=num_features,
            out_channels=self.num_keypoints,
            deconv_out_channels=self.deconv_out_channels,
            downsample_factor=self.downsample_factor,
            dtype=self.dtype,
        )

    def __call__(
        self, images: jax.Array, train: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        """``(B, 5, H, W, 3)`` single-view context stacks, or
        ``(B, V, 5, H, W, 3)`` multiview context stacks — views fold into
        the batch for the CRNN and unfold into view-major heatmap channels
        (reference models/base.py:296-343 view stacking)."""
        if images.ndim == 6:
            b, v = images.shape[0], images.shape[1]
            flat_views = images.reshape(b * v, *images.shape[2:])
            hm_sf, hm_mf = self(flat_views, train=train)
            return (
                _unfold_view_channels(hm_sf, b, v),
                _unfold_view_channels(hm_mf, b, v),
            )
        b, t, h, w, c = images.shape
        if self.context_repeat:
            features = self.backbone(images[:, t // 2], train=train)
            features = jnp.repeat(features[:, None], t, axis=1)
        else:
            flat = images.reshape(b * t, h, w, c)
            features = self.backbone(flat, train=train)
            features = features.reshape(b, t, *features.shape[1:])
        return self.head(features)

    def decode(
        self, heatmaps: jax.Array, fast: bool = False
    ) -> tuple[jax.Array, jax.Array]:
        return run_subpixelmaxima(
            heatmaps,
            downsample_factor=self.downsample_factor,
            temperature=1000.0,
            prefer_pallas=fast,
        )
