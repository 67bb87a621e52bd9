"""Config wrapper + validation (reference lightning_pose/api/model_config.py:22-320)."""

from __future__ import annotations

import os
from pathlib import Path

from lightning_pose_tpu.config import Config

__all__ = ["ModelConfig", "InvalidConfig"]


class InvalidConfig(ValueError):
    pass


class ModelConfig:
    """Wraps a config with convenience accessors and a ``validate()`` that
    mirrors the reference's checks (reference model_config.py:127-320)."""

    def __init__(self, cfg: Config) -> None:
        self.cfg = cfg

    @classmethod
    def from_yaml_file(cls, path: str) -> "ModelConfig":
        return cls(Config.from_yaml(path))

    # -- view handling (reference model_config.py:77-91)

    def is_multi_view(self) -> bool:
        view_names = self.cfg.data.get("view_names", None)
        if not view_names:
            return False
        if len(view_names) == 1:
            raise ValueError(
                "view_names with a single entry is not a valid multiview config"
            )
        return True

    def is_single_view(self) -> bool:
        return not self.is_multi_view()

    def test_video_files_singleview(self) -> list[str]:
        from lightning_pose_tpu.utils.io import get_videos_in_dir

        video_dir = self.cfg.eval.get("test_videos_directory")
        if not video_dir or not os.path.isdir(str(video_dir)):
            return []
        return list(get_videos_in_dir(str(video_dir)))

    def test_video_files_multiview(self) -> list[list[Path]]:
        from lightning_pose_tpu.utils.io import find_video_files_for_views

        video_dir = self.cfg.eval.get("test_videos_directory")
        if not video_dir:
            return []
        return find_video_files_for_views(
            str(video_dir), list(self.cfg.data.view_names)
        )

    # -- validation ---------------------------------------------------------------

    def validate(self) -> None:
        cfg = self.cfg
        self.validate_steps_vs_epochs()

        # resize dims must be multiples of 128 (reference model_config.py)
        h = cfg.data.image_resize_dims.get("height")
        w = cfg.data.image_resize_dims.get("width")
        if h is None or w is None:
            raise InvalidConfig("data.image_resize_dims height/width must be set")
        if h % 128 != 0 or w % 128 != 0:
            raise InvalidConfig(
                f"image_resize_dims ({h}, {w}) must each be a multiple of 128"
            )

        # keypoint counts
        num_keypoints = cfg.data.get("num_keypoints")
        keypoint_names = cfg.data.get("keypoint_names")
        if num_keypoints is not None and keypoint_names is not None:
            if len(keypoint_names) != num_keypoints:
                raise InvalidConfig(
                    f"data.num_keypoints ({num_keypoints}) does not match "
                    f"len(data.keypoint_names) ({len(keypoint_names)})"
                )

        # split probabilities
        train_prob = cfg.training.get("train_prob", 0.95)
        val_prob = cfg.training.get("val_prob", 0.05)
        if train_prob + val_prob > 1.0 + 1e-8:
            raise InvalidConfig(
                f"train_prob ({train_prob}) + val_prob ({val_prob}) must be <= 1"
            )

        # ckpt_every_n_epochs divisibility
        ckpt_every = cfg.training.get("ckpt_every_n_epochs")
        check_val = cfg.training.get("check_val_every_n_epoch", 5)
        if ckpt_every is not None and check_val and ckpt_every % check_val != 0:
            raise InvalidConfig(
                f"ckpt_every_n_epochs ({ckpt_every}) must be divisible by "
                f"check_val_every_n_epoch ({check_val})"
            )

        # milestones within max_epochs (epoch mode only)
        if cfg.training.get("max_epochs") is not None:
            milestones = cfg.training.lr_scheduler_params.multisteplr.get(
                "milestones", []
            )
            max_epochs = cfg.training.max_epochs
            import logging

            for m in milestones or []:
                if m > max_epochs:
                    logging.getLogger(__name__).warning(
                        f"lr milestone {m} exceeds max_epochs {max_epochs}; "
                        "it will never fire"
                    )

        # losses must have numeric log_weights
        for loss_name in cfg.model.get("losses_to_use") or []:
            if loss_name not in cfg.losses:
                raise InvalidConfig(f"no hyperparameters for loss '{loss_name}'")
            lw = cfg.losses[loss_name].get("log_weight")
            if not isinstance(lw, (int, float)):
                raise InvalidConfig(
                    f"losses.{loss_name}.log_weight must be numeric, got {lw!r}"
                )

        # model type
        from lightning_pose_tpu.models.factory import ALLOWED_MODEL_TYPES

        if cfg.model.model_type not in ALLOWED_MODEL_TYPES:
            raise InvalidConfig(
                f"model_type {cfg.model.model_type} not in {ALLOWED_MODEL_TYPES}"
            )

    def validate_steps_vs_epochs(self) -> None:
        """Strict steps-XOR-epochs mode (reference model_config.py:290-320)."""
        cfg = self.cfg
        epoch_fields = ["min_epochs", "max_epochs", "unfreezing_epoch"]
        step_fields = ["min_steps", "max_steps", "unfreezing_step"]
        has_epoch = any(cfg.training.get(f) is not None for f in epoch_fields)
        has_step = any(cfg.training.get(f) is not None for f in step_fields)
        milestones = cfg.training.lr_scheduler_params.multisteplr
        if milestones.get("milestones") is not None and has_step:
            raise InvalidConfig(
                "cannot mix step-based fields with epoch-based lr milestones; "
                "use milestone_steps"
            )
        if has_epoch and has_step:
            raise InvalidConfig(
                "cannot mix step-based and epoch-based training fields: "
                f"found epoch fields and step fields simultaneously"
            )
        if not has_epoch and not has_step:
            raise InvalidConfig(
                "must provide either epoch-based (min/max_epochs) or step-based "
                "(min/max_steps) training fields"
            )
        mins = cfg.training.get("min_epochs") or cfg.training.get("min_steps")
        maxs = cfg.training.get("max_epochs") or cfg.training.get("max_steps")
        if (mins is None) != (maxs is None):
            raise InvalidConfig("min and max epochs/steps must both be set")
