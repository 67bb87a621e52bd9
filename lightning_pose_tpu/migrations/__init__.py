"""On-startup data-directory migrations (reference lightning_pose/migrations/)."""

from lightning_pose_tpu.migrations.migrations import run_migrations

__all__ = ["run_migrations"]
