"""Training orchestration (reference lightning_pose/train.py:85-438).

The PL Trainer + callback stack of the reference becomes: one jitted,
donated train step over a 1-D data mesh (GSPMD data parallelism), with the
LR schedules, backbone unfreezing, and unsupervised-weight annealing all
closed-form functions of the global step (see ``schedules.py``). Target
heatmap generation and augmentation run inside the step on device.

Artifact contract matches the reference: ``config.yaml`` snapshot,
``tb_logs/<model_name>/version_N/checkpoints/epoch=E-step=S-best.ckpt``,
``predictions.csv`` (+ metric side CSVs), ``train_status.json`` with
TRAINING/COMPLETED transitions (reference train.py:103-125).
"""

from __future__ import annotations

import json
import logging
import math
import os
import shutil
import time
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from lightning_pose_tpu.data import bboxes as bboxes_mod
from lightning_pose_tpu.data.factory import get_data_module, get_dataset
from lightning_pose_tpu.data.heatmaps import generate_heatmaps
from lightning_pose_tpu.losses.factory import get_loss_factories
from lightning_pose_tpu.losses.losses import RegressionRMSELoss
from lightning_pose_tpu.models.factory import get_model
from lightning_pose_tpu.ops.augment import AugmentationEngine
from lightning_pose_tpu.ops.preprocess import normalize_images
from lightning_pose_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_local_batch,
)
from lightning_pose_tpu.train import checkpoints as ckpt_utils
from lightning_pose_tpu.train.schedules import anneal_weight, backbone_lr, multistep_lr
from lightning_pose_tpu.utils.io import return_absolute_data_paths

logger = logging.getLogger(__name__)

__all__ = ["train", "calculate_steps_per_epoch", "TrainState", "TrainedModel"]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def calculate_steps_per_epoch(data_module) -> int:
    """ceil(n_train / batch_size), min 10 for semi-supervised modules
    (reference train.py:63-82)."""
    steps = math.ceil(len(data_module.train_dataset) / data_module.train_batch_size)
    if hasattr(data_module, "unlabeled_loader"):
        steps = max(10, steps)
    return steps


# ------------------------------------------------------------------------------
# optimizer
# ------------------------------------------------------------------------------


def _resolve_schedule_cfg(cfg, steps_per_epoch: int) -> dict:
    """Resolve epoch-based vs step-based training config
    (reference train.py:325-340, model_config.py:290-320)."""
    tcfg = cfg.training
    step_mode = tcfg.get("max_steps") is not None
    if step_mode:
        max_steps = int(tcfg.max_steps)
        max_epochs = math.ceil(max_steps / steps_per_epoch)
        milestones_steps = list(
            tcfg.lr_scheduler_params.multisteplr.get("milestone_steps", [])
        )
        unfreeze_step = tcfg.get("unfreezing_step", 0)
        unfreeze_epoch = None
    else:
        max_epochs = int(tcfg.max_epochs)
        max_steps = max_epochs * steps_per_epoch
        milestones = list(tcfg.lr_scheduler_params.multisteplr.get("milestones", []))
        milestones_steps = [m * steps_per_epoch for m in milestones]
        unfreeze_epoch = tcfg.get("unfreezing_epoch", 20)
        unfreeze_step = None
    return dict(
        max_steps=max_steps,
        max_epochs=max_epochs,
        milestones_steps=milestones_steps,
        gamma=float(tcfg.lr_scheduler_params.multisteplr.get("gamma", 0.5)),
        unfreeze_epoch=unfreeze_epoch,
        unfreeze_step=unfreeze_step,
    )


def _patch_mask_schedule(
    cfg, steps_per_epoch: int
) -> tuple[float, float, int, int] | None:
    """Resolve the patch-mask curriculum to
    ``(init_ratio, final_ratio, start_step, end_step)``.

    Primary schema = the reference's ``training.patch_mask`` with
    ``init_epoch``/``final_epoch`` (converted at steps_per_epoch, reference
    train.py:335-340) or ``init_step``/``final_step`` (reference
    PatchMasker defaults 700/5000, callbacks.py:227-251);
    ``callbacks.patch_masking`` with ``start_epoch``/``end_epoch`` is kept
    as a back-compat alias. Returns None when absent or disabled
    (``final_ratio == 0``, reference callbacks.py:253-259).
    """
    pm = cfg.training.get("patch_mask", None)
    if pm is not None:
        init_ratio = float(pm.get("init_ratio", 0.1))
        final_ratio = float(pm.get("final_ratio", 0.5))
        if final_ratio == 0.0:
            return None
        if pm.get("init_epoch") is not None or pm.get("final_epoch") is not None:
            # ceil like the reference's epoch->step conversion
            # (train.py:335-340); epochs may be fractional
            start = math.ceil(float(pm.get("init_epoch", 0)) * steps_per_epoch)
            end = math.ceil(float(pm.get("final_epoch", 1)) * steps_per_epoch)
        else:
            start = int(pm.get("init_step", 700))
            end = int(pm.get("final_step", 5000))
        return init_ratio, final_ratio, start, max(end, 1)
    legacy = cfg.callbacks.get("patch_masking", None)
    if legacy is not None:
        final_ratio = float(legacy.get("final_ratio", 0.5))
        if final_ratio == 0.0:
            return None
        return (
            float(legacy.get("init_ratio", 0.0)),
            final_ratio,
            int(legacy.get("start_epoch", 0)) * steps_per_epoch,
            max(int(legacy.get("end_epoch", 1)) * steps_per_epoch, 1),
        )
    return None


def make_optimizer(cfg, steps_per_epoch: int, params) -> tuple[Any, Callable]:
    """Adam/AdamW with per-group (backbone vs head) LR schedules.

    Mirrors the reference's optimizer config (reference models/base.py
    optimizer setup) + UnfreezeBackbone + MultiStepLR semantics.
    """
    sched_cfg = _resolve_schedule_cfg(cfg, steps_per_epoch)
    base_lr = float(cfg.training.optimizer_params.get("learning_rate", 1e-3))
    # ceil like the reference's milestone_steps conversion (train.py:325-332)
    milestones_epochs = [
        math.ceil(m / steps_per_epoch) for m in sched_cfg["milestones_steps"]
    ]
    head_sched = multistep_lr(
        base_lr, milestones_epochs, sched_cfg["gamma"], steps_per_epoch
    )
    bb_sched = backbone_lr(
        base_lr,
        milestones_epochs,
        sched_cfg["gamma"],
        steps_per_epoch,
        unfreezing_epoch=sched_cfg["unfreeze_epoch"],
        unfreezing_step=sched_cfg["unfreeze_step"],
    )

    opt_name = str(cfg.training.get("optimizer", "Adam")).lower()

    def make_opt(schedule):
        if opt_name == "adamw":
            return optax.adamw(schedule)
        if opt_name == "adam":
            return optax.adam(schedule)
        raise NotImplementedError(f"optimizer {cfg.training.optimizer} not supported")

    def label_fn(params):
        return {
            k: jax.tree_util.tree_map(
                lambda _: "backbone" if k == "backbone" else "head", v
            )
            for k, v in params.items()
        }

    tx = optax.multi_transform(
        {"backbone": make_opt(bb_sched), "head": make_opt(head_sched)},
        label_fn(params),
    )
    return tx, head_sched, bb_sched


# ------------------------------------------------------------------------------
# step functions
# ------------------------------------------------------------------------------


def make_step_fns(
    module,
    meta: dict,
    loss_factories: dict,
    augmenter: AugmentationEngine,
    cfg,
    tx,
    steps_per_epoch: int,
):
    """Build jitted train/eval/predict step functions for single-frame
    heatmap and regression models."""
    height = int(cfg.data.image_resize_dims.height)
    width = int(cfg.data.image_resize_dims.width)
    df = meta["downsample_factor"]
    out_shape = (height // (2**df), width // (2**df))
    is_heatmap = meta["model_type"].startswith("heatmap")
    is_context = meta["model_type"] == "heatmap_mhcrnn"
    ctx_repeat = (
        cfg.model.get("mhcrnn_context_mode", "adjacent") == "repeat_center"
    )
    is_multiview = meta["model_type"] == "heatmap_multiview"
    num_views = int(meta.get("num_views", 1) or 1)
    uniform_nan = bool(cfg.training.get("uniform_heatmaps_for_nan_keypoints", False))
    anneal_cfg = cfg.callbacks.anneal_weight
    rmse_loss = RegressionRMSELoss()
    unsup = loss_factories.get("unsupervised")
    has_unsup = unsup is not None and len(unsup.loss_instance_dict) > 0

    def supervised_loss(
        params, batch_stats, images, keypoints, visibility, bbox, train, stage,
        extra_batch=None,
    ):
        extra_batch = extra_batch or {}
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            heatmaps, mutated = module.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            new_stats = mutated["batch_stats"]
        else:
            heatmaps = module.apply(variables, images, train=False)
            new_stats = batch_stats
        if is_heatmap:
            targets = generate_heatmaps(
                keypoints,
                height=height,
                width=width,
                output_shape=out_shape,
                visibility=visibility,
            )
            if is_context:
                # concatenate single-frame + multi-frame outputs, doubling
                # the batch (reference heatmap_tracker_mhcrnn.py:154-174)
                heatmaps_sf, heatmaps_mf = heatmaps
                heatmaps = jnp.concatenate([heatmaps_sf, heatmaps_mf], axis=0)
                targets = jnp.concatenate([targets, targets], axis=0)
                keypoints = jnp.concatenate([keypoints, keypoints], axis=0)
                visibility = jnp.concatenate([visibility, visibility], axis=0)
                bbox = jnp.concatenate([bbox, bbox], axis=0)
            preds, confidences = module.decode(heatmaps)
            # supervised 3D losses for calibrated multiview batches
            # (reference heatmap_tracker_multiview.py:259-323)
            extra_kwargs = {}
            sup_names = loss_factories["supervised"].loss_instance_dict.keys()
            if any(n.startswith("supervised_") for n in sup_names) and (
                not is_multiview or "intrinsic_matrix" not in extra_batch
            ):
                # configured 3D losses but no calibration in the batch:
                # surface the losses' descriptive errors
                # (reference losses.py:1252-1258)
                extra_kwargs["keypoints_targ_3d"] = None
                extra_kwargs["keypoints_pred_3d"] = None
                extra_kwargs["keypoints_pred_2d_reprojected"] = None
            elif is_multiview and any(n.startswith("supervised_") for n in sup_names):
                from lightning_pose_tpu.data.cameras import (
                    project_3d_to_2d,
                    project_camera_pairs_to_3d,
                )

                intr = extra_batch["intrinsic_matrix"].astype(jnp.float32)
                extr = extra_batch["extrinsic_matrix"].astype(jnp.float32)
                dist = extra_batch["distortions"].astype(jnp.float32)
                bsz = preds.shape[0]
                kpv = num_views
                nk = preds.shape[1] // 2 // kpv
                preds_frame = bboxes_mod.model_to_frame_batch(
                    preds, bbox, width, height, num_views=kpv
                )
                pred_views = preds_frame.reshape(bsz, kpv, nk, 2)
                kp_pred_3d = project_camera_pairs_to_3d(
                    pred_views, intr, extr, dist
                )
                targ_frame = bboxes_mod.model_to_frame_batch(
                    keypoints.reshape(bsz, -1), bbox, width, height, num_views=kpv
                )
                targ_views = jax.lax.stop_gradient(
                    targ_frame.reshape(bsz, kpv, nk, 2)
                )
                # nanmedian over camera pairs = the reference's
                # camgroup.triangulate_fast target semantics
                # (reference cameras.py:177, datasets.py:1013)
                kp_targ_3d = jnp.nanmedian(
                    project_camera_pairs_to_3d(targ_views, intr, extr, dist),
                    axis=1,
                )
                extra_kwargs["keypoints_pred_3d"] = kp_pred_3d
                extra_kwargs["keypoints_targ_3d"] = kp_targ_3d
                if "supervised_reprojection_heatmap_mse" in sup_names:
                    reproj_2d = project_3d_to_2d(
                        jnp.mean(kp_pred_3d, axis=1), intr, extr, dist
                    )  # (B, V, K, 2) original coords
                    reproj_model = bboxes_mod.frame_to_model_batch(
                        reproj_2d.reshape(bsz, kpv, nk, 2), bbox, width, height
                    ).reshape(bsz, kpv * nk, 2)
                    extra_kwargs["keypoints_pred_2d_reprojected"] = reproj_model
            loss, logs = loss_factories["supervised"](
                stage=stage,
                anneal_weight=None,
                heatmaps_targ=targets,
                heatmaps_pred=heatmaps,
                **extra_kwargs,
            )
        else:
            preds = heatmaps  # regression output
            confidences = jnp.ones(
                (preds.shape[0], preds.shape[1] // 2), dtype=jnp.float32
            )
            kp_flat = keypoints.reshape(keypoints.shape[0], -1)
            loss, logs = loss_factories["supervised"](
                stage=stage,
                anneal_weight=None,
                keypoints_targ=kp_flat,
                keypoints_pred=preds,
            )
            heatmaps = None
        # model coords -> original frame coords via per-sample bbox
        # (reference heatmap_tracker.py:140-142)
        preds = bboxes_mod.model_to_frame_batch(
            preds, bbox, width, height, num_views=num_views
        )
        kp_flat = keypoints.reshape(keypoints.shape[0], -1)
        kp_frame = bboxes_mod.model_to_frame_batch(
            kp_flat, bbox, width, height, num_views=num_views
        )
        # pixel-error logging (reference models/base.py:502)
        rmse, _ = rmse_loss(
            keypoints_targ=kp_frame, keypoints_pred=jax.lax.stop_gradient(preds)
        )
        logs = dict(logs)
        logs[f"{stage}_supervised_loss"] = loss
        logs[f"{stage}_supervised_rmse"] = rmse
        return loss, new_stats, logs, heatmaps, preds, confidences

    def _effective_visibility(kp, visibility):
        """Keypoints that augmentation pushed out of frame (NaN coords with
        visibility 2) drop to 0; originally-NaN labels already carry the
        uniform_heatmaps_for_nan_keypoints decision from the dataset
        (reference HeatmapDataset)."""
        nan = jnp.isnan(kp[..., 0])
        return jnp.where(nan & (visibility == 2), 0, visibility)

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        epoch = state.step // steps_per_epoch
        aug_rng = jax.random.fold_in(rng, state.step)
        if is_multiview:
            imgs = batch["images"]  # (B, V, H, W, 3)
            bsz = imgs.shape[0]
            kp_model = batch["keypoints"]
            # 3D scale/translate augmentation for calibrated batches
            # (reference datasets.py:825-1120)
            if "intrinsic_matrix" in batch and not augmenter.identity:
                from lightning_pose_tpu.ops.augment3d import apply_3d_transforms

                bbox_views = batch["bbox"].reshape(bsz, num_views, 4)
                sx = width / bbox_views[..., 3]
                sy = height / bbox_views[..., 2]
                zeros = jnp.zeros_like(sx)
                ones = jnp.ones_like(sx)
                frame_to_model = jnp.stack(
                    [
                        jnp.stack([sx, zeros, -bbox_views[..., 0] * sx], axis=-1),
                        jnp.stack([zeros, sy, -bbox_views[..., 1] * sy], axis=-1),
                        jnp.stack([zeros, zeros, ones], axis=-1),
                    ],
                    axis=-2,
                )
                kp_frame = bboxes_mod.model_to_frame_batch(
                    kp_model.reshape(bsz, -1), batch["bbox"], width, height,
                    num_views=num_views,
                ).reshape(bsz, -1, 2)
                imgs, kp_model = apply_3d_transforms(
                    jax.random.fold_in(aug_rng, 3),
                    imgs.astype(jnp.float32),
                    kp_frame,
                    batch["intrinsic_matrix"].astype(jnp.float32),
                    batch["extrinsic_matrix"].astype(jnp.float32),
                    batch["distortions"].astype(jnp.float32),
                    frame_to_model=frame_to_model,
                )
            kp = kp_model.reshape(bsz * num_views, -1, 2)
            imgs_flat = imgs.reshape(bsz * num_views, *imgs.shape[2:])
            imgs_aug, kp_aug = augmenter(aug_rng, imgs_flat, kp)
            # curriculum patch masking for the multiview transformer
            # (reference callbacks.py:191-451); schema = the reference's
            # training.patch_mask {init_epoch/final_epoch or
            # init_step/final_step, init_ratio, final_ratio} (reference
            # config_default_multiview.yaml:111-116, epoch->step conversion
            # train.py:335-340); cfg.callbacks.patch_masking
            # {start_epoch, end_epoch} kept as a back-compat alias
            pm = _patch_mask_schedule(cfg, steps_per_epoch)
            if pm is not None:
                from lightning_pose_tpu.callbacks import (
                    apply_patch_mask,
                    patch_mask_ratio,
                )

                init_ratio, final_ratio, start_step, end_step = pm
                ratio = patch_mask_ratio(
                    state.step,
                    init_ratio=init_ratio,
                    final_ratio=final_ratio,
                    start_step=start_step,
                    end_step=end_step,
                )
                imgs_aug = apply_patch_mask(
                    jax.random.fold_in(aug_rng, 7), imgs_aug, ratio
                )
            images = imgs_aug.reshape(bsz, num_views, *imgs_aug.shape[1:])
            keypoints = kp_aug.reshape(bsz, -1, 2)
        elif num_views > 1:
            # heatmap/mhcrnn trackers on multiview data: (B, V, H, W, 3)
            # frames or (B, V, 5, H, W, 3) context stacks — views augment
            # independently (fold into batch); for context each view's 5
            # frames share one transform (reference folds views into the
            # batch dim, models/base.py:296-343)
            imgs = batch["images"]
            bsz, v_ = imgs.shape[0], imgs.shape[1]
            flat = imgs.reshape(bsz * v_, *imgs.shape[2:])
            kp = batch["keypoints"].reshape(bsz * v_, -1, 2)
            imgs_aug, kp_aug = augmenter(aug_rng, flat, kp)
            images = imgs_aug.reshape(bsz, v_, *imgs_aug.shape[1:])
            keypoints = kp_aug.reshape(bsz, -1, 2)
        else:
            # single-view: visibility rides the engine so hflip swaps the
            # 0/1/2 flags lockstep with the keypoint identities (reference
            # datasets.py:338); multiview datasets use identity swaps
            images, keypoints, vis_aug = augmenter(
                aug_rng, batch["images"], batch["keypoints"],
                batch["visibility"],
            )
            batch = dict(batch, visibility=vis_aug)
        visibility = _effective_visibility(keypoints, batch["visibility"])
        images = normalize_images(images)

        aw = anneal_weight(
            epoch,
            init_val=float(anneal_cfg.init_val),
            increase_factor=float(anneal_cfg.increase_factor),
            final_val=float(anneal_cfg.final_val),
            freeze_until_epoch=int(anneal_cfg.freeze_until_epoch),
        )

        def loss_fn(params):
            loss, new_stats, logs, heatmaps, preds, confs = supervised_loss(
                params, state.batch_stats, images, keypoints, visibility,
                batch["bbox"], train=True, stage="train", extra_batch=batch,
            )
            total = loss
            if has_unsup and "unlabeled" in batch:
                from lightning_pose_tpu.data.video import (
                    undo_affine_transform_batch,
                )
                from lightning_pose_tpu.ops.video_augment import (
                    augment_video_sequence,
                )

                ul = batch["unlabeled"]
                # DALI-equivalent train augmentation on device
                # (reference dali.py:156-182), only for dlc-style presets;
                # multiview windows get photometric-only treatment per view
                # (views must stay geometrically consistent)
                if num_views > 1:
                    t_, v_ = ul["frames"].shape[0], ul["frames"].shape[1]
                    flat_frames = ul["frames"].reshape(
                        t_ * v_, *ul["frames"].shape[2:]
                    )
                    ul_frames, ul_transforms = augment_video_sequence(
                        jax.random.fold_in(aug_rng, 1),
                        flat_frames,
                        apply_geometric=False,
                    )
                    ul_frames = ul_frames.reshape(t_, v_, *ul_frames.shape[1:])
                    ul_transforms = ul_transforms[:t_]
                else:
                    ul_in = ul["frames"]
                    if ul_in.ndim == 3:
                        # planar I420 transfer (half the bytes); convert to
                        # RGB on device before augmentation (ops/yuv.py)
                        from lightning_pose_tpu.ops.yuv import i420_to_rgb

                        ul_in = i420_to_rgb(ul_in)
                    ul_frames, ul_transforms = augment_video_sequence(
                        jax.random.fold_in(aug_rng, 1),
                        ul_in,
                        apply_geometric=augmenter.is_dlc,
                    )
                ul_images = normalize_images(ul_frames)
                variables = {"params": params, "batch_stats": new_stats}
                if is_context:
                    from lightning_pose_tpu.models.heatmap_tracker_mhcrnn import (
                        make_context_windows,
                        merge_heads_by_confidence,
                    )

                    if ul_images.ndim == 5:
                        # multiview unlabeled (T, V, H, W, 3): windows per
                        # view, then (T-4, V, 5, H, W, 3) — the model folds
                        # views into the batch (reference base.py:323-343)
                        w5 = make_context_windows(
                            ul_images, repeat_center=ctx_repeat
                        )
                        ul_windows = w5.transpose(0, 2, 1, 3, 4, 5)
                    else:
                        ul_windows = make_context_windows(
                            ul_images, repeat_center=ctx_repeat
                        )
                    (ul_sf, ul_mf), mutated = module.apply(
                        variables, ul_windows, train=True,
                        mutable=["batch_stats"],
                    )
                    new_stats = mutated["batch_stats"]
                    kp_sf, conf_sf = module.decode(ul_sf)
                    kp_mf, conf_mf = module.decode(ul_mf)
                    ul_preds, ul_confs = merge_heads_by_confidence(
                        kp_sf, conf_sf, kp_mf, conf_mf
                    )
                    ul_heatmaps = ul_mf
                    ul_transforms = ul_transforms[2:-2]
                    if "bbox" in ul:
                        ul = dict(ul, bbox=ul["bbox"][2:-2])
                elif is_heatmap:
                    ul_heatmaps, mutated = module.apply(
                        variables, ul_images, train=True, mutable=["batch_stats"]
                    )
                    new_stats = mutated["batch_stats"]
                    ul_preds, ul_confs = module.decode(ul_heatmaps)
                else:  # regression: the output IS the keypoints
                    ul_preds, mutated = module.apply(
                        variables, ul_images, train=True, mutable=["batch_stats"]
                    )
                    new_stats = mutated["batch_stats"]
                    ul_heatmaps = None
                    ul_confs = jnp.ones(
                        (ul_preds.shape[0], ul_preds.shape[1] // 2),
                        dtype=jnp.float32,
                    )
                # undo the augmentation so unsupervised losses act in
                # original frame coords (reference data/utils.py:192-235),
                # then remap model -> frame resolution like the reference's
                # model_to_frame_batch on unlabeled batches
                ul_preds = undo_affine_transform_batch(ul_preds, ul_transforms)
                if "bbox" in ul:
                    ul_preds = bboxes_mod.model_to_frame_batch(
                        ul_preds, ul["bbox"], width, height,
                        num_views=num_views,
                    )
                loss_unsup, logs_unsup = unsup(
                    stage="train",
                    anneal_weight=aw,
                    keypoints_pred=ul_preds,
                    heatmaps_pred=ul_heatmaps,
                    confidences=ul_confs,
                )
                total = total + loss_unsup
                logs = {**logs, **logs_unsup,
                        "train_unsupervised_loss": loss_unsup}
            return total, (new_stats, logs)

        (total, (new_stats, logs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        logs["total_loss"] = total
        logs["total_unsupervised_importance"] = aw
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, logs

    def eval_step(state: TrainState, batch: dict, stage: str):
        images = normalize_images(batch["images"].astype(jnp.float32))
        keypoints = batch["keypoints"]
        visibility = _effective_visibility(keypoints, batch["visibility"])
        loss, _, logs, _, preds, confs = supervised_loss(
            state.params, state.batch_stats, images, keypoints, visibility,
            batch["bbox"], train=False, stage=stage, extra_batch=batch,
        )
        return logs, preds, confs

    def predict_step(state: TrainState, images_uint8: jax.Array, bbox: jax.Array):
        from lightning_pose_tpu.ops.preprocess import normalize_images_fused

        images = normalize_images_fused(images_uint8)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if is_context:
            from lightning_pose_tpu.models.heatmap_tracker_mhcrnn import (
                make_context_windows,
                merge_heads_by_confidence,
            )

            if num_views > 1:
                if images.ndim == 5:  # (T, V, H, W, 3) multiview sequence
                    images = make_context_windows(
                        images, repeat_center=ctx_repeat
                    ).transpose(
                        0, 2, 1, 3, 4, 5
                    )  # -> (T-4, V, 5, H, W, 3)
            elif images.ndim == 4:  # video sequence -> sliding windows
                images = make_context_windows(
                    images, repeat_center=ctx_repeat
                )
            heatmaps_sf, heatmaps_mf = module.apply(variables, images, train=False)
            kp_sf, conf_sf = module.decode(heatmaps_sf, fast=True)
            kp_mf, conf_mf = module.decode(heatmaps_mf, fast=True)
            preds, confs = merge_heads_by_confidence(kp_sf, conf_sf, kp_mf, conf_mf)
        elif is_heatmap:
            heatmaps = module.apply(variables, images, train=False)
            preds, confs = module.decode(heatmaps, fast=True)
        else:
            preds = module.apply(variables, images, train=False)
            confs = jnp.ones((preds.shape[0], preds.shape[1] // 2))
        preds = bboxes_mod.model_to_frame_batch(
            preds, bbox, width, height, num_views=num_views
        )
        return preds, confs

    def train_step_cached(state, cache, idxs, valid, rng, unlabeled):
        """Train step over a device-resident labeled-data cache: only the
        batch indices cross the host-device boundary (TPU-first: small
        labeled datasets live in HBM for the whole run)."""
        batch = {k: jnp.take(v, idxs, axis=0) for k, v in cache.items()}
        batch["visibility"] = jnp.where(
            valid[:, None], batch["visibility"], 0
        )
        # NaN pad-row labels so the logged pixel RMSE ignores them (same
        # masking collate_batch applies on the host path)
        batch["keypoints"] = jnp.where(
            valid[:, None, None], batch["keypoints"], jnp.nan
        )
        batch["valid"] = valid
        if unlabeled:
            batch["unlabeled"] = unlabeled
        return train_step(state, batch, rng)

    def train_epoch_cached(state, cache, idxs_all, valid_all, rng, unlabeled_all):
        """A whole epoch as one ``lax.scan`` over the cached train step:
        ONE device program per epoch instead of one per step — per-step
        dispatch/RPC overhead disappears and XLA can overlap the next
        step's gather with the current step's backward pass.

        idxs_all/valid_all: (steps, batch) stacked index batches.
        unlabeled_all: ``{}`` for supervised training, or a pytree of
        epoch-prefetched unlabeled video windows stacked along a leading
        (steps,) axis — the scan slices one window per step, so
        semi-supervised epochs run as one device program too (the host
        decodes the next epoch's windows while this one executes).
        Returns (state, logs stacked along axis 0).
        """

        def body(st, xs):
            idxs, valid, ul = xs
            st, logs = train_step_cached(st, cache, idxs, valid, rng, ul)
            return st, logs

        return jax.lax.scan(body, state, (idxs_all, valid_all, unlabeled_all))

    return (
        jax.jit(train_step, donate_argnums=0),
        jax.jit(eval_step, static_argnames="stage"),
        jax.jit(predict_step),
        jax.jit(train_step_cached, donate_argnums=0),
        jax.jit(train_epoch_cached, donate_argnums=0),
    )


# ------------------------------------------------------------------------------
# orchestration
# ------------------------------------------------------------------------------


class TrainedModel:
    """Lightweight handle on a trained model (precursor of api.Model)."""

    def __init__(self, cfg, model_dir: str, module, meta, state, predict_fn, data_module):
        self.cfg = cfg
        self.model_dir = Path(model_dir)
        self.module = module
        self.meta = meta
        self.state = state
        self.predict_fn = predict_fn
        self.data_module = data_module


def run_validation_epoch(batches, eval_logs_fn) -> dict[str, float]:
    """Sample-weighted epoch validation metrics.

    Each batch's per-batch-mean logs are weighted by its real-sample count
    (the ``valid`` mask sum) so a partial final batch doesn't skew the
    epoch metric — every sample counts equally, matching the semantics of
    a single mean over the whole validation set.
    """
    logs_sum: dict[str, float] = {}
    n_total = 0
    for batch in batches:
        if "valid" in batch:
            n_real = int(np.sum(batch["valid"]))
        else:
            n_real = len(next(iter(batch.values())))
        logs = eval_logs_fn(batch)
        for k, v in logs.items():
            logs_sum[k] = logs_sum.get(k, 0.0) + float(v) * n_real
        n_total += n_real
    return {k: v / max(n_total, 1) for k, v in logs_sum.items()}


def resolve_scan_epochs(scan_flag, platform: str, has_device_cache: bool,
                        has_unlabeled: bool, multihost: bool = False) -> bool:
    """Resolve cfg.training.scan_epochs (auto | true | false) to a bool.

    "auto" scans whole epochs as one lax.scan device program on
    accelerator backends (where it beats pipelined per-step dispatch:
    31.1 vs 47.7 ms/step measured on v5e after the Pallas augmentation
    kernels) and keeps the per-step loop on CPU, where the scanned
    program's per-epoch-length recompiles dominate. Scanning requires the
    labeled device cache. Semi-supervised training scans too — the epoch's
    unlabeled video windows prefetch on the host and ship as one stacked
    batch; under multi-host DP each host stacks its own decode shard and
    the global stack assembles along the batch axis
    (``shard_stacked_local_batch``).
    """
    if isinstance(scan_flag, str):
        scan_flag = (
            platform != "cpu"
            if scan_flag.lower() == "auto"
            else scan_flag.lower() == "true"
        )
    del has_unlabeled, multihost  # no longer gate scanning
    return bool(scan_flag) and has_device_cache


def _write_status(path: Path, status: str, **extra) -> None:
    contents = {"status": status, **extra}
    tmp = str(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(contents, f)
    os.replace(tmp, str(path))


def train(cfg, model_dir: str | Path | None = None, skip_evaluation: bool = False):
    """Train a model from a config; writes the full artifact contract
    (reference train.py:85-127).

    Multi-host DP: set ``cfg.training.num_nodes > 1`` (or the
    LP_TPU_COORDINATOR env var) to bring up ``jax.distributed`` — every
    process runs the same train() over one global mesh; only process 0
    writes artifacts and runs post-training evaluation (the reference exits
    non-zero DDP ranks after fit, train.py:435-436).
    """
    num_nodes = int(cfg.training.get("num_nodes", 1) or 1)
    if num_nodes > 1 or os.environ.get("LP_TPU_COORDINATOR"):
        from lightning_pose_tpu.parallel.mesh import initialize_distributed

        initialize_distributed()
        if num_nodes > 1 and jax.process_count() < num_nodes:
            # without this, each process would silently train an independent
            # full copy and race on the artifact directory
            raise RuntimeError(
                f"cfg.training.num_nodes={num_nodes} but jax reports "
                f"{jax.process_count()} process(es) — multi-host bring-up "
                "failed (check coordinator address / LP_TPU_* env vars, and "
                "that nothing initialized a jax backend first)"
            )
    is_main = jax.process_index() == 0
    multihost = jax.process_count() > 1

    model_dir = Path(model_dir or os.getcwd())
    if is_main:
        model_dir.mkdir(parents=True, exist_ok=True)
    status_file = model_dir / "train_status.json"

    t_start = time.time()

    # ---- seeding (reference train.py:284-291)
    seed = int(cfg.training.get("rng_seed_model_pt", 0))
    np.random.seed(seed)

    # ---- validation
    from lightning_pose_tpu.api.model_config import ModelConfig

    ModelConfig(cfg).validate()

    # ---- data
    data_dir, video_dir = return_absolute_data_paths(cfg.data)
    dataset = get_dataset(cfg, data_dir)
    if cfg.data.get("keypoint_names", None) is None:
        cfg.data.keypoint_names = list(dataset.keypoint_names)
    if cfg.data.get("num_keypoints", None) is None:
        cfg.data.num_keypoints = dataset.num_keypoints
    data_module = get_data_module(cfg, dataset, video_dir)
    steps_per_epoch = calculate_steps_per_epoch(data_module)

    # ---- losses (PCA fits happen here, on host)
    loss_factories = get_loss_factories(cfg, data_module)

    # ---- model
    # multiview models take the per-view keypoint count (the head is shared
    # across views); single-view models take the total
    module, meta = get_model(
        cfg,
        num_keypoints=getattr(dataset, "num_keypoints_per_view", dataset.num_keypoints),
    )
    height = int(cfg.data.image_resize_dims.height)
    width = int(cfg.data.image_resize_dims.width)
    rng = jax.random.PRNGKey(seed)
    if meta["model_type"] == "heatmap_mhcrnn":
        dummy = jnp.zeros((1, 5, height, width, 3), dtype=jnp.float32)
    elif meta["model_type"] == "heatmap_multiview":
        nv = int(meta.get("num_views", 1) or 1)
        dummy = jnp.zeros((1, nv, height, width, 3), dtype=jnp.float32)
    else:
        dummy = jnp.zeros((1, height, width, 3), dtype=jnp.float32)
    variables = module.init(rng, dummy, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    # optional pretrained-backbone port from a local torch checkpoint
    # (replaces the reference's torchvision/MMPose downloads,
    # reference backbones/factory.py:238-334)
    bb_ckpt = cfg.model.get("backbone_checkpoint")
    if bb_ckpt and os.path.isfile(str(bb_ckpt)):
        import flax.serialization

        from lightning_pose_tpu.models.backbones.torch_port import (
            port_backbone_checkpoint,
        )

        pretrained = port_backbone_checkpoint(
            str(cfg.model.backbone), str(bb_ckpt), image_size=height
        )
        params = dict(params)
        params["backbone"] = flax.serialization.from_state_dict(
            params["backbone"], pretrained["params"]
        )
        if pretrained.get("batch_stats"):
            batch_stats = dict(batch_stats)
            batch_stats["backbone"] = flax.serialization.from_state_dict(
                batch_stats["backbone"], pretrained["batch_stats"]
            )
        logger.info(f"loaded pretrained backbone weights from {bb_ckpt}")

    # optional warm-start (reference models/factory.py:211-229): accepts a
    # .ckpt file or a model directory; falls back to backbone-only weights
    # when the head does not match (e.g. different num_keypoints)
    if cfg.model.get("checkpoint"):
        params, batch_stats, full = ckpt_utils.warm_start(
            params, batch_stats, str(cfg.model.checkpoint)
        )
        if full:
            logger.info(f"warm-started from {cfg.model.checkpoint}")
        else:
            logger.warning(
                f"checkpoint {cfg.model.checkpoint} does not match the model "
                "head; warm-started backbone weights only"
            )

    # ---- optimizer
    tx, head_sched, bb_sched = make_optimizer(cfg, steps_per_epoch, params)
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.asarray(0, dtype=jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )

    # ---- mesh: 1-D data parallel over the requested number of chips
    # (multi-host: all global devices join the mesh)
    if multihost:
        num_devices = jax.device_count()
    else:
        num_devices = min(
            int(cfg.training.get("num_gpus", 1) or 1), jax.device_count()
        )
        num_devices = max(1, num_devices)
    mesh = make_mesh(num_devices)
    if multihost:
        from lightning_pose_tpu.parallel.mesh import sync_collectives

        sync_collectives(mesh)
    state = replicate(mesh, state)

    # ---- augmentation engine
    augmenter = AugmentationEngine(
        pipeline=dataset.imgaug_pipeline,
        image_height=height,
        image_width=width,
        hflip=bool(cfg.training.get("imgaug_hflip", False)),
        hflip_swap_indices=dataset.hflip_swap_indices,
    )

    train_step, eval_step, predict_step, train_step_cached, train_epoch_cached = make_step_fns(
        module, meta, loss_factories, augmenter, cfg, tx, steps_per_epoch
    )

    # ---- device-resident labeled-data cache: when the whole labeled set
    # fits comfortably in HBM (it usually does — pose datasets are a few
    # hundred frames), park it there once and send only batch indices each
    # step. Eliminates the per-step host->device image transfer entirely.
    device_cache = None
    if bool(cfg.training.get("cache_labeled_data_on_device", True)):
        sample0 = dataset[0]
        cache_keys = [
            k for k in sample0 if k not in ("idx", "num_views")
        ]
        est_bytes = len(dataset) * sum(
            np.asarray(sample0[k]).nbytes for k in cache_keys
        )
        if est_bytes < 2 * 1024**3:
            arrays: dict[str, list] = {k: [] for k in cache_keys}
            for i in range(len(dataset)):
                s = dataset[i]
                for k in arrays:
                    arrays[k].append(np.asarray(s[k]))
            host_cache = {k: np.stack(v) for k, v in arrays.items()}
            device_cache = replicate(mesh, host_cache)
            logger.info(
                f"cached {len(dataset)} labeled samples "
                f"({est_bytes / 1e6:.0f} MB) on device"
            )

    # ---- logging + dirs (reference train.py:349-383); process 0 only
    if is_main:
        cfg.save(str(model_dir / "config.yaml"))
        csv_files = cfg.data.csv_file
        if isinstance(csv_files, str):
            csv_files = [csv_files]
        for csv_file in csv_files:
            csv_src = Path(csv_file)
            if not csv_src.is_absolute():
                csv_src = Path(data_dir) / csv_src
            if csv_src.exists():
                shutil.copy(csv_src, model_dir / csv_src.name)

    # auto-resume after preemption (TPU-VM spot instances): with
    # training.resume=true, pick up the newest *-last.ckpt (full training
    # state incl. optimizer) and continue IN THE SAME version dir. The
    # reference has no mid-run resume (PL restarts from scratch).
    resume_ckpt_path = None
    if bool(cfg.training.get("resume", False)):
        resume_ckpt_path = ckpt_utils.find_resume_checkpoint(
            str(model_dir), cfg.model.model_name
        )
        if resume_ckpt_path is None:
            logger.info("training.resume=true but no *-last.ckpt found; "
                        "starting fresh")

    if resume_ckpt_path is not None:
        version_dir = str(Path(resume_ckpt_path).parent.parent)
    else:
        version_dir = ckpt_utils.next_version_dir(
            str(model_dir), cfg.model.model_name
        )
    if is_main:
        os.makedirs(version_dir, exist_ok=True)
        ckpt_dir = ckpt_utils.checkpoint_dir(version_dir)
    else:  # path only — non-main processes never create or write it
        ckpt_dir = os.path.join(version_dir, "checkpoints")
    writer = None
    if is_main:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(version_dir)
            writer.add_text("config", "```\n" + cfg.to_yaml() + "\n```")
        except Exception:  # tensorboardX optional
            writer = None

    sched_cfg = _resolve_schedule_cfg(cfg, steps_per_epoch)
    max_epochs = sched_cfg["max_epochs"]
    min_epochs = int(cfg.training.get("min_epochs") or 0)
    check_val_every = int(cfg.training.get("check_val_every_n_epoch", 5) or 5)
    log_every = int(cfg.training.get("log_every_n_steps", 10) or 10)
    ckpt_every = cfg.training.get("ckpt_every_n_epochs", None)
    ckpt_backend = str(cfg.training.get("checkpoint_backend", "msgpack"))
    early_stopping = bool(cfg.training.get("early_stopping", False))
    patience = int(cfg.training.get("early_stop_patience", 3) or 3)

    if is_main:
        _write_status(status_file, "TRAINING")
    from lightning_pose_tpu.callbacks import JSONTrainingProgressTracker

    progress = JSONTrainingProgressTracker(
        status_file if is_main else None, total_epochs=max_epochs
    )
    data_rng = jax.random.PRNGKey(int(cfg.training.get("rng_seed_data_pt", 0)))

    best_val = float("inf")
    best_ckpt_path = None
    bad_val_checks = 0
    global_step = 0
    start_epoch = 0
    last_ckpt_path = None

    if resume_ckpt_path is not None:
        import flax.serialization

        ckpt = ckpt_utils.load_checkpoint(resume_ckpt_path)
        state = TrainState(
            step=jnp.asarray(int(ckpt["step"]), dtype=jnp.int32),
            params=flax.serialization.from_state_dict(
                state.params, ckpt["params"]
            ),
            batch_stats=flax.serialization.from_state_dict(
                state.batch_stats, ckpt["batch_stats"]
            ),
            opt_state=flax.serialization.from_state_dict(
                state.opt_state, ckpt["opt_state"]
            ),
        )
        global_step = int(ckpt["step"])
        start_epoch = int(ckpt["epoch"]) + 1
        best_val = float(ckpt["extra"].get("best_val", float("inf")))
        bad_val_checks = int(ckpt["extra"].get("bad_val_checks", 0))
        bp = ckpt["extra"].get("best_ckpt_path") or None
        best_ckpt_path = bp if bp and os.path.exists(bp) else None
        last_ckpt_path = resume_ckpt_path
        # from_state_dict returns host numpy — put back on the mesh, fully
        # replicated (host-numpy params would re-ship per step, see
        # CLAUDE.md round-2 fix)
        state = replicate(mesh, state)
        logger.info(
            f"resumed from {resume_ckpt_path}: epoch {start_epoch}, "
            f"step {global_step}"
        )

    logger.info(
        f"training {cfg.model.model_type}/{cfg.model.backbone} for {max_epochs} "
        f"epochs x {steps_per_epoch} steps on {num_devices} device(s)"
    )

    # profiling: jax.profiler trace into the TensorBoard dir (the reference
    # passes cfg.training.profiler straight to pl.Trainer, train.py:426)
    profiler_on = bool(cfg.training.get("profiler", False))
    if profiler_on:
        jax.profiler.start_trace(version_dir)

    use_epoch_scan = resolve_scan_epochs(
        cfg.training.get("scan_epochs", "auto"),
        jax.devices()[0].platform,
        device_cache is not None,
        hasattr(data_module, "unlabeled_loader"),
        multihost=multihost,
    )

    max_train_steps = int(sched_cfg["max_steps"])

    def _flush_scanned_logs(logs_stack, base_step, ep, n_steps):
        logs_np = {k: np.asarray(v) for k, v in logs_stack.items()}
        for s in range(n_steps):
            gs = base_step + s + 1
            if gs % log_every == 0:
                for k, v in logs_np.items():
                    writer.add_scalar(k, float(v[s]), gs)
                writer.add_scalar("lr-head", float(head_sched(gs)), gs)
                writer.add_scalar("lr-backbone", float(bb_sched(gs)), gs)
                writer.add_scalar("epoch", ep, gs)

    # scanned-epoch log stacks are materialized ONE EPOCH LATE: np.asarray
    # on the stack blocks until that epoch's program finishes on device, so
    # flushing epoch e's logs only after epoch e+1 is dispatched lets the
    # host decode + ship epoch e+1's unlabeled windows while the device is
    # still executing epoch e (the semisup pipeline was otherwise
    # serialized by this sync: decode + ~MB-scale transfer sat between
    # every pair of epochs).
    pending_logs = None

    for epoch in range(start_epoch, max_epochs):
        # in step mode the final epoch may be partial (the reference's PL
        # Trainer stops exactly at max_steps)
        steps_this_epoch = min(steps_per_epoch, max_train_steps - global_step)
        if steps_this_epoch <= 0:
            break
        if use_epoch_scan:
            pairs = list(
                data_module.train_index_batches(epoch, steps=steps_this_epoch)
            )
            from lightning_pose_tpu.parallel.mesh import (
                shard_stacked_batch,
                shard_stacked_local_batch,
            )

            unlabeled_all = {}
            if hasattr(data_module, "unlabeled_loader"):
                # prefetch the epoch's unlabeled windows and ship them as
                # one (steps, ...) stack — the decode threads fill the
                # next epoch's windows while this epoch's program runs.
                # Multi-host: each host stacks its own decode shard; the
                # global stack assembles along the batch axis.
                windows = [
                    next(data_module.unlabeled_loader) for _ in range(len(pairs))
                ]
                unlabeled_all = shard_stacked_local_batch(
                    mesh,
                    {
                        k: np.stack([np.asarray(w[k]) for w in windows])
                        for k in windows[0]
                    },
                )
            state, logs_stack = train_epoch_cached(
                state,
                device_cache,
                shard_stacked_batch(mesh, np.stack([p[0] for p in pairs])),
                shard_stacked_batch(mesh, np.stack([p[1] for p in pairs])),
                data_rng,
                unlabeled_all,
            )
            steps_done = len(pairs)
            if writer is not None:
                if pending_logs is not None:
                    _flush_scanned_logs(*pending_logs)
                pending_logs = (logs_stack, global_step, epoch, steps_done)
            global_step += steps_done
            batch_iter = ()
        elif device_cache is not None:
            batch_iter = data_module.train_index_batches(
                epoch, steps=steps_this_epoch
            )
        else:
            batch_iter = data_module.train_batches(epoch, steps=steps_this_epoch)
        for item in batch_iter:
            if device_cache is not None:
                idxs, valid = item
                unlabeled = {}
                if hasattr(data_module, "unlabeled_loader"):
                    # per-host video shards -> global batch
                    unlabeled = shard_local_batch(
                        mesh, next(data_module.unlabeled_loader)
                    )
                state, logs = train_step_cached(
                    state,
                    device_cache,
                    shard_batch(mesh, idxs),
                    shard_batch(mesh, valid),
                    data_rng,
                    unlabeled,
                )
            else:
                unlabeled_host = item.pop("unlabeled", None)
                device_batch = shard_batch(mesh, item)
                if unlabeled_host is not None:
                    device_batch["unlabeled"] = shard_local_batch(
                        mesh, unlabeled_host
                    )
                state, logs = train_step(state, device_batch, data_rng)
            global_step += 1
            if writer is not None and global_step % log_every == 0:
                for k, v in logs.items():
                    writer.add_scalar(k, float(v), global_step)
                writer.add_scalar("lr-head", float(head_sched(global_step)), global_step)
                writer.add_scalar(
                    "lr-backbone", float(bb_sched(global_step)), global_step
                )
                writer.add_scalar("epoch", epoch, global_step)

        progress.update(epoch)
        run_val = ((epoch + 1) % check_val_every == 0) or (epoch == max_epochs - 1)
        if run_val and len(data_module.val_dataset) > 0:
            val_logs = run_validation_epoch(
                data_module.val_batches(),
                lambda b: eval_step(state, shard_batch(mesh, b), stage="val")[0],
            )
            if writer is not None:
                for k, v in val_logs.items():
                    writer.add_scalar(k, v, global_step)
            val_loss = val_logs.get("val_supervised_loss", float("inf"))

            # best-checkpoint tracking (reference callbacks.py:675-689)
            if val_loss < best_val:
                best_val = val_loss
                bad_val_checks = 0
                if is_main and best_ckpt_path and os.path.exists(best_ckpt_path):
                    ckpt_utils.remove_checkpoint(best_ckpt_path)
                best_ckpt_path = os.path.join(
                    ckpt_dir, f"epoch={epoch}-step={global_step}-best.ckpt"
                )
                if is_main:
                    ckpt_utils.save_checkpoint(
                        best_ckpt_path, state.params, state.batch_stats,
                        global_step, epoch, backend=ckpt_backend,
                    )
            else:
                bad_val_checks += 1

            if ckpt_every and is_main:
                if (epoch + 1) % int(ckpt_every) == 0:
                    path = os.path.join(
                        ckpt_dir, f"epoch={epoch}-step={global_step}.ckpt"
                    )
                    ckpt_utils.save_checkpoint(
                        path, state.params, state.batch_stats, global_step,
                        epoch, backend=ckpt_backend,
                    )

            # resume checkpoint: full training state incl. optimizer, one
            # per run, refreshed at every validation boundary so a
            # preempted run (training.resume=true) loses at most
            # check_val_every_n_epoch epochs
            if is_main:
                prev_last = last_ckpt_path
                last_ckpt_path = os.path.join(
                    ckpt_dir, f"epoch={epoch}-step={global_step}-last.ckpt"
                )
                ckpt_utils.save_checkpoint(
                    last_ckpt_path, state.params, state.batch_stats,
                    global_step, epoch, backend=ckpt_backend,
                    opt_state=state.opt_state,
                    extra={
                        "best_val": float(best_val),
                        "bad_val_checks": int(bad_val_checks),
                        "best_ckpt_path": best_ckpt_path or "",
                    },
                )
                if prev_last and prev_last != last_ckpt_path and os.path.exists(prev_last):
                    ckpt_utils.remove_checkpoint(prev_last)

            if (
                early_stopping
                and bad_val_checks >= patience
                and epoch + 1 >= min_epochs
            ):
                logger.info(f"early stopping at epoch {epoch}")
                break

    # always leave at least one checkpoint
    if best_ckpt_path is None:
        best_ckpt_path = os.path.join(
            ckpt_dir, f"epoch={max_epochs - 1}-step={global_step}-best.ckpt"
        )
        if is_main:
            ckpt_utils.save_checkpoint(
                best_ckpt_path, state.params, state.batch_stats, global_step,
                max_epochs - 1, backend=ckpt_backend,
            )

    ckpt_utils.wait_for_saves()  # commit any in-flight async checkpoint
    if profiler_on:
        jax.profiler.stop_trace()
    if writer is not None:
        if pending_logs is not None:
            _flush_scanned_logs(*pending_logs)
        writer.close()
    if hasattr(data_module, "close"):
        data_module.close()

    logger.info(f"training finished in {time.time() - t_start:.1f}s")

    if multihost and not is_main:
        # only process 0 evaluates and writes artifacts (the reference exits
        # non-zero ranks after fit, train.py:435-436)
        logger.info("non-main process done; skipping evaluation")
        return None
    if multihost:
        # fetch the replicated global state to local host memory so the
        # single-device evaluation/prediction path runs without the mesh
        state = jax.tree_util.tree_map(
            lambda x: jnp.asarray(np.asarray(x)), state
        )

    _write_status(status_file, "EVALUATING")

    # reload the best checkpoint so post-training artifacts reflect exactly
    # what Model.from_dir will later load from this directory (the reference
    # evaluates Model.from_dir(model_dir), train.py:438; with early stopping
    # or late val regressions the final in-memory state can differ)
    try:
        best = ckpt_utils.load_checkpoint(best_ckpt_path)
        import flax.serialization

        state = state.replace(
            params=flax.serialization.from_state_dict(
                state.params, best["params"]
            ),
            batch_stats=flax.serialization.from_state_dict(
                state.batch_stats, best["batch_stats"]
            ),
        )
        logger.info(f"reloaded best checkpoint for evaluation: {best_ckpt_path}")
    except Exception as e:  # never fail the run over eval-state selection
        logger.warning(f"could not reload best checkpoint ({e}); using final state")

    model = TrainedModel(
        cfg=cfg,
        model_dir=model_dir,
        module=module,
        meta=meta,
        state=state,
        predict_fn=predict_step,
        data_module=data_module,
    )

    if not skip_evaluation:
        _evaluate_on_training_dataset(model)
        # OOD/test-frame predictions from suffixed label files, silently
        # skipped when absent (reference train.py:110-113)
        _evaluate_on_suffixed_csv(model, suffix="_new")
        _evaluate_on_suffixed_csv(model, suffix="_test")
        _predict_test_videos(model)

    _write_status(status_file, "COMPLETED")
    return model


def _suffixed_csv_paths(cfg, suffix: str) -> list[Path] | None:
    """Absolute paths of '<stem><suffix>.csv' label files, or None if the
    first one does not exist (reference train.py:146-200 skip semantics)."""
    csv_cfg = cfg.data.csv_file
    csv_files = [csv_cfg] if isinstance(csv_cfg, str) else list(csv_cfg)
    out = []
    for csv_file in csv_files:
        p = Path(csv_file)
        if not p.is_absolute():
            p = Path(cfg.data.data_dir) / p
        out.append(p.with_stem(p.stem + suffix))
    if not out[0].exists():
        return None
    return out


def _evaluate_on_suffixed_csv(model: TrainedModel, suffix: str) -> None:
    """Predict '<csv_stem><suffix>.csv' label files after training (the
    reference's '_new'/'_test' OOD evaluation, train.py:110-113,146-246).
    Writes image_preds/<name>/predictions*.csv (no train/val/test 'set'
    column) plus suffixed legacy copies in the model dir."""
    from lightning_pose_tpu.data.datamodules import BaseDataModule
    from lightning_pose_tpu.data.factory import get_dataset
    from lightning_pose_tpu.metrics import compute_metrics_single
    from lightning_pose_tpu.utils.predictions import PredictionHandler

    cfg = model.cfg
    csv_paths = _suffixed_csv_paths(cfg, suffix)
    if csv_paths is None:
        return
    logger.info(f"Predicting {suffix.lstrip('_')} images...")

    cfg2 = cfg.copy()
    multiview = not isinstance(cfg.data.csv_file, str)
    cfg2.data.csv_file = (
        [str(p) for p in csv_paths] if multiview else str(csv_paths[0])
    )
    try:
        dataset = get_dataset(cfg2, str(cfg.data.data_dir), imgaug_pipeline="default")
        data_module = BaseDataModule(
            dataset=dataset,
            train_batch_size=cfg.training.train_batch_size,
            val_batch_size=cfg.training.val_batch_size,
            test_batch_size=cfg.training.test_batch_size,
            train_probability=cfg.training.train_prob,
            val_probability=cfg.training.get("val_prob", None),
            torch_seed=cfg.training.get("rng_seed_data_pt", 42),
        )
    except Exception as e:
        logger.warning(f"could not load {suffix} label files ({e}); skipping")
        return

    preds = []
    for batch in data_module.full_batches():
        kp, conf = model.predict_fn(model.state, batch["images"], batch["bbox"])
        valid = batch["valid"]
        preds.append((np.asarray(kp)[valid], np.asarray(conf)[valid]))
    handler = PredictionHandler(cfg=cfg2, data_module=data_module)
    result = handler(preds)

    results = (
        result if isinstance(result, dict) else {None: result}
    )  # view name -> dataframe
    view_iter = list(results.items())
    for i, (view_name, df) in enumerate(view_iter):
        # the set column stays (all labeled predictions carry it, reference
        # predictions.py:220-236; compute_metrics keys pixel-error off it)
        csv_path = csv_paths[i]
        preds_dir = model.model_dir / "image_preds" / csv_path.name
        preds_dir.mkdir(parents=True, exist_ok=True)
        preds_file = preds_dir / "predictions.csv"
        df.to_csv(preds_file)
        try:
            compute_metrics_single(
                cfg=cfg2,
                labels_file=str(csv_path),
                preds_file=str(preds_file),
                data_module=data_module,
            )
        except Exception as e:
            logger.warning(f"metrics computation failed ({suffix}): {e}")
        # legacy copies: predictions[_<view>][_<metric>]<suffix>.csv
        for p_file in preds_dir.glob("predictions*.csv"):
            stem_rest = p_file.stem[len("predictions"):]
            out_name = "predictions"
            if view_name is not None:
                out_name += f"_{view_name}"
            out_name += f"{stem_rest}{suffix}.csv"
            shutil.copy(p_file, model.model_dir / out_name)


def _evaluate_on_training_dataset(model: TrainedModel) -> None:
    """Predict all labeled frames, write predictions.csv + metric CSVs
    (reference train.py:146-246)."""
    from lightning_pose_tpu.metrics import compute_metrics_single
    from lightning_pose_tpu.utils.predictions import PredictionHandler

    cfg = model.cfg
    data_module = model.data_module
    preds = []
    for batch in data_module.full_batches():
        kp, conf = model.predict_fn(model.state, batch["images"], batch["bbox"])
        valid = batch["valid"]
        preds.append((np.asarray(kp)[valid], np.asarray(conf)[valid]))
    handler = PredictionHandler(cfg=cfg, data_module=data_module)
    result = handler(preds)

    view_names = cfg.data.get("view_names", None)
    if isinstance(result, dict):  # multiview: one dataframe per view
        csv_files = list(cfg.data.csv_file)
        for view_name, csv_file in zip(view_names, csv_files):
            df = result[view_name]
            csv_name = Path(csv_file).name
            preds_dir = model.model_dir / "image_preds" / csv_name
            preds_dir.mkdir(parents=True, exist_ok=True)
            preds_file = preds_dir / "predictions.csv"
            df.to_csv(preds_file)
            labels_file = Path(csv_file)
            if not labels_file.is_absolute():
                labels_file = Path(cfg.data.data_dir) / labels_file
            try:
                compute_metrics_single(
                    cfg=cfg,
                    labels_file=str(labels_file),
                    preds_file=str(preds_file),
                    data_module=data_module,
                )
            except Exception as e:
                logger.warning(f"metrics computation failed ({view_name}): {e}")
            for p_file in preds_dir.glob("predictions*.csv"):
                out_name = p_file.stem.replace(
                    "predictions", f"predictions_{view_name}"
                ) + ".csv"
                shutil.copy(p_file, model.model_dir / out_name)
        return

    df = result
    csv_name = Path(cfg.data.csv_file).name
    preds_dir = model.model_dir / "image_preds" / csv_name
    preds_dir.mkdir(parents=True, exist_ok=True)
    preds_file = preds_dir / "predictions.csv"
    df.to_csv(preds_file)

    labels_file = Path(cfg.data.csv_file)
    if not labels_file.is_absolute():
        labels_file = Path(cfg.data.data_dir) / labels_file
    try:
        compute_metrics_single(
            cfg=cfg,
            labels_file=str(labels_file),
            preds_file=str(preds_file),
            data_module=data_module,
        )
    except Exception as e:
        logger.warning(f"metrics computation failed: {e}")

    # legacy copies in the model dir (reference train.py:226-245)
    for p_file in preds_dir.glob("predictions*.csv"):
        shutil.copy(p_file, model.model_dir / p_file.name)


def _predict_test_videos(model: TrainedModel) -> None:
    """Predict videos in cfg.eval.test_videos_directory
    (reference train.py:248-271)."""
    cfg = model.cfg
    if not cfg.eval.get("predict_vids_after_training", False):
        return
    video_dir = cfg.eval.get("test_videos_directory")
    if not video_dir or not os.path.isdir(str(video_dir)):
        return
    view_names = cfg.data.get("view_names", None)
    if view_names and len(view_names) > 1:
        try:
            from lightning_pose_tpu.utils.io import find_video_files_for_views
            from lightning_pose_tpu.utils.video_predictions import (
                predict_video_multiview,
            )

            for session_videos in find_video_files_for_views(
                str(video_dir), list(view_names)
            ):
                logger.info(f"predicting multiview session: {session_videos}")
                predict_video_multiview(
                    video_file_per_view=[str(v) for v in session_videos],
                    view_names=list(view_names),
                    cfg=cfg,
                    predict_fn=model.predict_fn,
                    state=model.state,
                    model_dir=str(model.model_dir),
                    generate_labeled_video=bool(
                        cfg.eval.get("save_vids_after_training", False)
                    ),
                )
        except Exception as e:
            logger.warning(f"multiview video prediction failed: {e}")
        return
    try:
        from lightning_pose_tpu.utils.video_predictions import predict_video
        from lightning_pose_tpu.utils.io import get_videos_in_dir

        for video_file in get_videos_in_dir(str(video_dir)):
            logger.info(f"predicting video: {video_file}")
            predict_video(
                video_file=video_file,
                cfg=cfg,
                predict_fn=model.predict_fn,
                state=model.state,
                model_dir=str(model.model_dir),
                data_module=model.data_module,
                generate_labeled_video=bool(
                    cfg.eval.get("save_vids_after_training", False)
                ),
            )
    except Exception as e:
        logger.warning(f"video prediction failed: {e}")
