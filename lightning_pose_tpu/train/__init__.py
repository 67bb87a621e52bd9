"""Training orchestration: optax schedules, jitted steps, checkpointing."""

from lightning_pose_tpu.train.trainer import calculate_steps_per_epoch, train

__all__ = ["train", "calculate_steps_per_epoch"]
