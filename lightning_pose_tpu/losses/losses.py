"""Supervised and unsupervised pose losses — pure JAX, fixed shapes.

Re-designs the reference loss pipeline (reference
lightning_pose/losses/losses.py:61-199: remove_nans -> compute -> epsilon-
rectify -> reduce -> log) for XLA: the reference's data-dependent
``masked_select`` / boolean-indexing NaN removal produces dynamic shapes, so
every loss here is recast as a **masked fixed-shape** computation — invalid
entries contribute zero to the numerator and are excluded from the
denominator. Loss weighting matches the reference exactly:
``weight = 1 / (2 * exp(log_weight))`` (reference losses.py:90-101).

Heatmaps are channels-last ``(batch, height, width, keypoints)`` throughout.

Loss classes hold static hyperparameters and are constructed outside jit;
``__call__`` is pure and traceable, returning ``(scalar_loss, logs_dict)``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from lightning_pose_tpu.data.heatmaps import generate_heatmaps

__all__ = [
    "Loss",
    "HeatmapMSELoss",
    "HeatmapKLLoss",
    "HeatmapJSLoss",
    "PCALoss",
    "TemporalLoss",
    "TemporalHeatmapLoss",
    "UnimodalLoss",
    "RegressionMSELoss",
    "RegressionRMSELoss",
]

_EPS = 1e-10


def masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of ``values`` where ``mask`` is true; 0 when nothing is valid.

    ``mask`` broadcasts against ``values``; the denominator counts broadcast
    elements so the result equals the reference's mean-after-boolean-indexing.
    """
    mask = jnp.broadcast_to(mask, values.shape)
    num = jnp.sum(jnp.where(mask, values, 0.0))
    den = jnp.sum(mask.astype(values.dtype))
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)


def _kl_div_2d(p: jax.Array, q: jax.Array) -> jax.Array:
    """KL(p || q) per keypoint over spatial dims.

    Args: ``(batch, H, W, K)`` normalized heatmaps. Returns ``(batch, K)``.
    """
    unreduced = p * (jnp.log(p) - jnp.log(q))
    return jnp.sum(unreduced, axis=(1, 2))


def kl_div_loss_2d(pred: jax.Array, target: jax.Array) -> jax.Array:
    """KL(target || pred) per keypoint (kornia ``kl_div_loss_2d`` semantics,
    used at reference losses.py:350)."""
    return _kl_div_2d(target, pred)


def js_div_loss_2d(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Jensen-Shannon divergence per keypoint (kornia ``js_div_loss_2d``)."""
    m = 0.5 * (pred + target)
    return 0.5 * _kl_div_2d(target, m) + 0.5 * _kl_div_2d(pred, m)


class Loss:
    """Base class: weighting + epsilon rectification (reference losses.py:61)."""

    loss_name: str = "base"

    def __init__(
        self,
        epsilon: float | list[float] = 0.0,
        log_weight: float = 0.0,
        **kwargs: Any,
    ) -> None:
        self.epsilon = jnp.asarray(epsilon, dtype=jnp.float32)
        self.log_weight = float(log_weight)

    @property
    def weight(self) -> float:
        """``1 / (2 * exp(log_weight))`` (reference losses.py:100)."""
        import math

        return 1.0 / (2.0 * math.exp(self.log_weight))

    def rectify_epsilon(self, loss: jax.Array) -> jax.Array:
        """Zero loss values below epsilon (epsilon-insensitive ReLU)."""
        return jax.nn.relu(loss - self.epsilon)

    def log_loss(self, loss: jax.Array, stage: str | None) -> dict[str, jax.Array]:
        return {
            f"{stage}_{self.loss_name}_loss": loss,
            f"{self.loss_name}_weight": jnp.float32(self.weight),
        }


# ------------------------------------------------------------------------------
# heatmap losses (supervised)
# ------------------------------------------------------------------------------


def _valid_heatmap_mask(targets: jax.Array) -> jax.Array:
    """(B, K) mask of keypoints whose target heatmap is not all-zero
    (reference losses.py:238-241)."""
    return jnp.any(targets != 0.0, axis=(1, 2))


class HeatmapLoss(Loss):
    """Base for heatmap divergence losses; masks all-zero target maps."""

    def elementwise(self, targets: jax.Array, predictions: jax.Array) -> jax.Array:
        raise NotImplementedError

    def __call__(
        self,
        heatmaps_targ: jax.Array,
        heatmaps_pred: jax.Array,
        stage: str | None = None,
        **kwargs: Any,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """heatmaps: ``(batch, H, W, K)``; returns (scalar loss, logs)."""
        valid = _valid_heatmap_mask(heatmaps_targ)  # (B, K)
        elementwise = self.elementwise(heatmaps_targ, heatmaps_pred)
        if elementwise.ndim == 4:  # per-pixel loss: broadcast mask over H, W
            mask = valid[:, None, None, :]
        else:  # per-keypoint loss (KL/JS)
            mask = valid
        scalar = masked_mean(elementwise, mask)
        return scalar, self.log_loss(scalar, stage)


class HeatmapMSELoss(HeatmapLoss):
    """Pixel-wise MSE x (h*w) (reference losses.py:285-327)."""

    loss_name = "heatmap_mse"

    def elementwise(self, targets: jax.Array, predictions: jax.Array) -> jax.Array:
        h, w = targets.shape[1], targets.shape[2]
        return (targets - predictions) ** 2 * (h * w)


class HeatmapKLLoss(HeatmapLoss):
    """Per-keypoint KL(target || pred) (reference losses.py:330-371)."""

    loss_name = "heatmap_kl"

    def elementwise(self, targets: jax.Array, predictions: jax.Array) -> jax.Array:
        return kl_div_loss_2d(predictions + _EPS, targets + _EPS)


class HeatmapJSLoss(HeatmapLoss):
    """Per-keypoint Jensen-Shannon divergence (reference losses.py:374-415)."""

    loss_name = "heatmap_js"

    def elementwise(self, targets: jax.Array, predictions: jax.Array) -> jax.Array:
        return js_div_loss_2d(predictions + _EPS, targets + _EPS)


# ------------------------------------------------------------------------------
# PCA loss (unsupervised)
# ------------------------------------------------------------------------------


class PCALoss(Loss):
    """Penalize predictions outside a learned low-dim subspace
    (reference losses.py:418-565).

    Takes a fitted :class:`~lightning_pose_tpu.utils.pca.KeypointPCA`; its
    parameters (mean, kept components) are device constants inside the jitted
    training step. Epsilon comes either from config or from the empirical
    percentile of training reprojection error (computed at fit time on host).
    """

    def __init__(
        self,
        loss_name: str,
        pca: Any,
        epsilon: float | None = None,
        empirical_epsilon_multiplier: float = 1.0,
        log_weight: float = 0.0,
        **kwargs: Any,
    ) -> None:
        if loss_name not in ("pca_singleview", "pca_multiview"):
            raise ValueError(f"Invalid loss_name: {loss_name}")
        super().__init__(log_weight=log_weight)
        self.loss_name = loss_name
        self.pca = pca
        if epsilon is not None:
            self.epsilon = jnp.asarray(epsilon, dtype=jnp.float32)
        else:
            self.epsilon = jnp.asarray(
                float(pca.parameters["epsilon"]) * empirical_epsilon_multiplier,
                dtype=jnp.float32,
            )

    def __call__(
        self,
        keypoints_pred: jax.Array,
        stage: str | None = None,
        **kwargs: Any,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """keypoints_pred: ``(batch, 2 * num_keypoints)`` flat (x, y) coords."""
        formatted = self.pca.format_data_jax(keypoints_pred)
        err = self.pca.reprojection_error_jax(formatted)  # (samples, K_eff)
        rectified = self.rectify_epsilon(jnp.nan_to_num(err, nan=0.0))
        valid = ~jnp.isnan(err)
        scalar = masked_mean(rectified, valid)
        return scalar, self.log_loss(scalar, stage)


# ------------------------------------------------------------------------------
# temporal losses (unsupervised)
# ------------------------------------------------------------------------------


class TemporalLoss(Loss):
    """L2 norm of frame-to-frame keypoint differences
    (reference losses.py:568-695)."""

    loss_name = "temporal"

    def __init__(
        self,
        epsilon: float | list[float] = 0.0,
        prob_threshold: float = 0.0,
        log_weight: float = 0.0,
        **kwargs: Any,
    ) -> None:
        super().__init__(epsilon=epsilon, log_weight=log_weight)
        self.prob_threshold = float(prob_threshold)

    def __call__(
        self,
        keypoints_pred: jax.Array,
        confidences: jax.Array | None = None,
        stage: str | None = None,
        **kwargs: Any,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """keypoints_pred ``(batch, 2K)``; confidences ``(batch, K)`` or None."""
        diffs = jnp.diff(keypoints_pred, axis=0)  # (B-1, 2K)
        diffs = diffs.reshape(diffs.shape[0], -1, 2)
        loss = jnp.sqrt(jnp.sum(diffs**2, axis=2) + 1e-12)  # (B-1, K)
        if confidences is not None:
            conf_ok = confidences >= self.prob_threshold
            pair_ok = conf_ok[:-1] & conf_ok[1:]
            loss = jnp.where(pair_ok, loss, 0.0)
        rectified = self.rectify_epsilon(loss)
        scalar = jnp.mean(rectified)
        return scalar, self.log_loss(scalar, stage)


class TemporalHeatmapLoss(Loss):
    """Temporal differences between consecutive heatmaps
    (reference losses.py:698-846)."""

    def __init__(
        self,
        loss_name: str,
        epsilon: float | list[float] = 0.0,
        prob_threshold: float = 0.0,
        log_weight: float = 0.0,
        **kwargs: Any,
    ) -> None:
        if loss_name not in ("temporal_heatmap_mse", "temporal_heatmap_kl"):
            raise ValueError(f"Invalid loss_name: {loss_name}")
        super().__init__(epsilon=epsilon, log_weight=log_weight)
        self.loss_name = loss_name
        self.prob_threshold = float(prob_threshold)

    def __call__(
        self,
        heatmaps_pred: jax.Array,
        confidences: jax.Array,
        stage: str | None = None,
        **kwargs: Any,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """heatmaps_pred ``(batch, H, W, K)``; confidences ``(batch, K)``."""
        prev, nxt = heatmaps_pred[:-1], heatmaps_pred[1:]
        if self.loss_name == "temporal_heatmap_mse":
            diffs = jnp.mean((prev - nxt) ** 2, axis=(1, 2))  # (B-1, K)
        else:
            diffs = kl_div_loss_2d(nxt + _EPS, prev + _EPS)
        conf_ok = confidences >= self.prob_threshold
        pair_ok = conf_ok[:-1] & conf_ok[1:]
        diffs = jnp.where(pair_ok, diffs, 0.0)
        rectified = self.rectify_epsilon(diffs)
        scalar = jnp.mean(rectified)
        return scalar, self.log_loss(scalar, stage)


# ------------------------------------------------------------------------------
# unimodal loss (unsupervised)
# ------------------------------------------------------------------------------


class UnimodalLoss(Loss):
    """Penalize multimodal heatmaps against an ideal Gaussian at the predicted
    peak (reference losses.py:849-1004)."""

    def __init__(
        self,
        loss_name: str,
        original_image_height: int,
        original_image_width: int,
        downsampled_image_height: int,
        downsampled_image_width: int,
        prob_threshold: float = 0.0,
        log_weight: float = 0.0,
        **kwargs: Any,
    ) -> None:
        if loss_name not in ("unimodal_mse", "unimodal_kl", "unimodal_js"):
            raise ValueError(f"Invalid loss_name: {loss_name}")
        super().__init__(log_weight=log_weight)
        self.loss_name = loss_name
        self.original_image_height = int(original_image_height)
        self.original_image_width = int(original_image_width)
        self.downsampled_image_height = int(downsampled_image_height)
        self.downsampled_image_width = int(downsampled_image_width)
        self.prob_threshold = float(prob_threshold)

    def __call__(
        self,
        keypoints_pred_augmented: jax.Array,
        heatmaps_pred: jax.Array,
        confidences: jax.Array,
        stage: str | None = None,
        **kwargs: Any,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """keypoints in augmented-image space ``(batch, 2K)``; heatmaps
        ``(batch, H, W, K)``; confidences ``(batch, K)``."""
        kp = keypoints_pred_augmented.reshape(keypoints_pred_augmented.shape[0], -1, 2)
        # ideal heatmaps carry no gradient (reference losses.py:986 comment)
        heatmaps_ideal = generate_heatmaps(
            jax.lax.stop_gradient(kp),
            height=self.original_image_height,
            width=self.original_image_width,
            output_shape=(self.downsampled_image_height, self.downsampled_image_width),
        )
        valid = confidences >= self.prob_threshold  # (B, K)
        if self.loss_name == "unimodal_mse":
            elementwise = (heatmaps_ideal - heatmaps_pred) ** 2  # (B,H,W,K)
            mask = valid[:, None, None, :]
        elif self.loss_name == "unimodal_kl":
            elementwise = kl_div_loss_2d(heatmaps_pred + _EPS, heatmaps_ideal + _EPS)
            mask = valid
        else:
            elementwise = js_div_loss_2d(heatmaps_pred + _EPS, heatmaps_ideal + _EPS)
            mask = valid
        scalar = masked_mean(elementwise, mask)
        return scalar, self.log_loss(scalar, stage)


# ------------------------------------------------------------------------------
# regression losses (supervised)
# ------------------------------------------------------------------------------


class PairwiseProjectionsLoss(Loss):
    """L2 between target 3D keypoints and per-camera-pair triangulations
    (reference losses.py:1142-1269)."""

    loss_name = "supervised_pairwise_projections"

    def __call__(
        self,
        keypoints_targ_3d: jax.Array,
        keypoints_pred_3d: jax.Array,
        stage: str | None = None,
        **kwargs: Any,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """targ (batch, K, 3); pred (batch, cam_pairs, K, 3); NaNs masked."""
        if keypoints_targ_3d is None or keypoints_pred_3d is None:
            raise ValueError(
                f"3D keypoints not available for {stage} stage. Camera params "
                "file is required but not found; turn off "
                "supervised_pairwise_projections loss to avoid this error."
            )
        nan_targ = jnp.any(jnp.isnan(keypoints_targ_3d), axis=-1)  # (B, K)
        nan_pred = jnp.any(jnp.isnan(keypoints_pred_3d), axis=-1)  # (B, P, K)
        invalid = nan_targ[:, None, :] | nan_pred
        targ = jnp.nan_to_num(keypoints_targ_3d, nan=0.0)[:, None]
        pred = jnp.nan_to_num(keypoints_pred_3d, nan=0.0)
        dist = jnp.sqrt(jnp.sum((targ - pred) ** 2, axis=-1) + 1e-12)
        scalar = masked_mean(dist, ~invalid)
        return scalar, self.log_loss(scalar, stage)


class ReprojectionHeatmapLoss(Loss):
    """MSE between target heatmaps and heatmaps generated from 3D->2D
    reprojected predictions (reference losses.py:1272-1402)."""

    loss_name = "supervised_reprojection_heatmap_mse"

    def __init__(
        self,
        original_image_height: int,
        original_image_width: int,
        downsampled_image_height: int,
        downsampled_image_width: int,
        log_weight: float = 0.0,
        **kwargs: Any,
    ) -> None:
        super().__init__(log_weight=log_weight)
        self.original_image_height = int(original_image_height)
        self.original_image_width = int(original_image_width)
        self.downsampled_image_height = int(downsampled_image_height)
        self.downsampled_image_width = int(downsampled_image_width)

    def __call__(
        self,
        heatmaps_targ: jax.Array,
        keypoints_pred_2d_reprojected: jax.Array,
        stage: str | None = None,
        **kwargs: Any,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        """targ (B, H, W, K); reprojected keypoints (B, K, 2) model coords.

        Gradients flow through the reprojected keypoints into the Gaussian
        targets (reference keep_gradients=True, losses.py:1394).
        """
        if keypoints_pred_2d_reprojected is None:
            raise ValueError(
                f"Reprojected keypoints not available for {stage} stage. "
                "Camera params file is required but not found; turn off "
                "supervised_reprojection_heatmap loss to avoid this error."
            )
        heatmaps_pred = generate_heatmaps(
            keypoints_pred_2d_reprojected,
            height=self.original_image_height,
            width=self.original_image_width,
            output_shape=(
                self.downsampled_image_height,
                self.downsampled_image_width,
            ),
        )
        h, w = heatmaps_targ.shape[1], heatmaps_targ.shape[2]
        elementwise = (heatmaps_targ - heatmaps_pred) ** 2 * (h * w)
        valid = _valid_heatmap_mask(heatmaps_targ)
        scalar = masked_mean(elementwise, valid[:, None, None, :])
        return scalar, self.log_loss(scalar, stage)


class RegressionMSELoss(Loss):
    """MSE between target and predicted coordinates, NaN targets masked
    (reference losses.py:1007-1096)."""

    loss_name = "regression"

    def __call__(
        self,
        keypoints_targ: jax.Array,
        keypoints_pred: jax.Array,
        stage: str | None = None,
        **kwargs: Any,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        mask = ~jnp.isnan(keypoints_targ)
        sq = (jnp.nan_to_num(keypoints_targ, nan=0.0) - keypoints_pred) ** 2
        scalar = masked_mean(sq, mask)
        return scalar, self.log_loss(scalar, stage)


class RegressionRMSELoss(Loss):
    """Per-keypoint Euclidean pixel error (reference losses.py:1099-1139).

    Matches the reference's masked-then-paired semantics: NaN coordinate
    entries are dropped, survivors are re-paired into (x, y) — since labels
    are NaN per-keypoint (both coords), this equals a per-keypoint distance
    over valid keypoints.
    """

    loss_name = "rmse"

    def __call__(
        self,
        keypoints_targ: jax.Array,
        keypoints_pred: jax.Array,
        stage: str | None = None,
        **kwargs: Any,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        targ = keypoints_targ.reshape(-1, 2)
        pred = keypoints_pred.reshape(-1, 2)
        valid = ~jnp.any(jnp.isnan(targ), axis=1)  # (N,)
        sq = jnp.where(
            valid[:, None], (jnp.nan_to_num(targ, nan=0.0) - pred) ** 2, 0.0
        )
        dist = jnp.sqrt(jnp.mean(sq, axis=1) + 1e-12)
        scalar = masked_mean(dist, valid)
        return scalar, self.log_loss(scalar, stage)
