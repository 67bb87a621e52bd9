"""Unlabeled data module: combined labeled + video-frame batches.

The reference pairs labeled and unlabeled loaders with Lightning's
``CombinedLoader(mode="max_size_cycle")`` (reference
lightning_pose/data/datamodules.py:240-341): each training step consumes
one labeled batch and one unlabeled video window. Here the labeled
iterator drives the epoch and each yielded batch carries an ``unlabeled``
sub-dict of raw uint8 frames; geometric/photometric video augmentation and
normalization run fused on device inside the train step.
"""

from __future__ import annotations

import logging

from lightning_pose_tpu.data.datamodules import BaseDataModule
from lightning_pose_tpu.data.video import UnlabeledVideoLoader
from lightning_pose_tpu.utils.io import check_video_paths

logger = logging.getLogger(__name__)

__all__ = ["UnlabeledDataModule"]


class UnlabeledDataModule(BaseDataModule):
    """BaseDataModule + a background unlabeled video stream."""

    def __init__(
        self,
        cfg=None,
        video_dir: str | None = None,
        **kwargs,
    ) -> None:
        super().__init__(**kwargs)
        assert cfg is not None and video_dir is not None
        self.cfg = cfg
        self.video_dir = video_dir
        seq_len = int(cfg.dali.base.train.sequence_length)
        seed = int(cfg.training.get("rng_seed_data_pt", 0)) + 123456
        # multi-host DP: each host decodes its own shard of the unlabeled
        # stream with a decorrelated seed and a per-host slice of the
        # sequence length so the GLOBAL unlabeled batch stays at the
        # configured size (the reference's per-rank seq_len division +
        # per-rank DALI seeds, reference data/factory.py:252-291,
        # dali.py:580-592)
        import jax

        shard_id = jax.process_index()
        num_shards = jax.process_count()
        if num_shards > 1:
            seq_len = max(1, -(-seq_len // num_shards))
        view_names = cfg.data.get("view_names", None)
        if view_names and len(view_names) > 1:
            from lightning_pose_tpu.data.video import MultiviewUnlabeledVideoLoader
            from lightning_pose_tpu.utils.io import find_video_files_for_views

            sessions = find_video_files_for_views(video_dir, list(view_names))
            self.unlabeled_loader = MultiviewUnlabeledVideoLoader(
                sessions=[[str(v) for v in views] for views in sessions],
                sequence_length=seq_len,
                resize_height=int(cfg.data.image_resize_dims.height),
                resize_width=int(cfg.data.image_resize_dims.width),
                seed=seed,
                shard_id=shard_id,
            )
            logger.info(
                f"multiview unlabeled stream: {len(sessions)} session(s), "
                f"sequence_length={seq_len}"
            )
        else:
            # planar-I420 transfer halves the per-step host->device bytes
            # on TPU (cfg.training.video_transfer_format: auto|rgb|yuv420);
            # the train step converts on device (ops/yuv.py)
            fmt = str(
                cfg.training.get("video_transfer_format", "auto")
            ).lower()
            if fmt == "auto":
                fmt = "yuv420" if jax.default_backend() == "tpu" else "rgb"
            video_files = check_video_paths(video_dir)
            self.unlabeled_loader = UnlabeledVideoLoader(
                video_files=list(video_files),
                sequence_length=seq_len,
                resize_height=int(cfg.data.image_resize_dims.height),
                resize_width=int(cfg.data.image_resize_dims.width),
                seed=seed,
                shard_id=shard_id,
                transfer_format=fmt,
            )
            logger.info(
                f"unlabeled stream: {len(video_files)} video(s), "
                f"sequence_length={seq_len}"
            )

    def close(self) -> None:
        self.unlabeled_loader.close()

    def train_batches(self, epoch: int, steps: int | None = None):
        """Yield labeled batches augmented with an 'unlabeled' frames dict
        (max_size_cycle pairing, reference datamodules.py:320-341)."""
        for batch in super().train_batches(epoch, steps=steps):
            batch["unlabeled"] = next(self.unlabeled_loader)
            yield batch
