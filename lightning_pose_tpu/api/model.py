"""High-level Model API (reference lightning_pose/api/model.py:231-1342).

``Model.from_dir`` loads a trained model directory (config.yaml +
tb_logs/.../checkpoints/*-best.ckpt discovery), rebuilds the Flax module,
and exposes prediction entry points:

- ``predict_on_label_csv`` -> image_preds/<csv>/predictions.csv (+ metrics)
- ``predict_on_video_file`` -> video_preds/<stem>.csv (+ labeled mp4)
- ``predict_frame`` -> keypoints for an in-memory frame

Checkpoint loading is lazy (reference model.py:448-467); the forward is one
jitted program reused across calls. ``export`` serializes the jitted
computation via ``jax.export`` — the XLA-AOT analog of the reference's ONNX
path (reference model.py:615-704).
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from lightning_pose_tpu.api.model_config import ModelConfig
from lightning_pose_tpu.config import Config
from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

logger = logging.getLogger(__name__)

__all__ = ["Model"]


class Model:
    """Lazy-loading high-level interface to a trained model directory."""

    def __init__(
        self,
        model_dir: str | Path,
        config: ModelConfig,
        precision: str | None = None,
        data_parallel: bool = False,
    ) -> None:
        self.model_dir = Path(model_dir)
        self.config = config
        self.cfg = config.cfg
        self.precision = precision
        self.data_parallel = data_parallel
        self._module = None
        self._meta = None
        self._state = None
        self._predict_fn = None

    # -- constructors ---------------------------------------------------------------

    @classmethod
    def from_dir(
        cls,
        model_dir: str | Path,
        precision: str | None = None,
        data_parallel: bool = False,
    ) -> "Model":
        """Load from a model directory containing config.yaml
        (reference model.py:291). ``precision``: fp32 | bf16 (default bf16;
        fp16 maps to bf16 — TPUs have no fp16 units, reference
        model.py:44-65 maps precision strings similarly).

        ``data_parallel``: shard inference batches across ALL attached
        chips (GSPMD over a 1-D data mesh; parameters replicated). The
        reference has no multi-GPU inference — this is TPU-native
        beyond-parity: one ``litpose predict`` saturates a whole pod slice.
        No-op on a single chip."""
        config_path = Path(model_dir) / "config.yaml"
        if not config_path.exists():
            raise FileNotFoundError(f"no config.yaml in {model_dir}")
        cfg = Config.from_yaml(str(config_path))
        return cls(
            model_dir, ModelConfig(cfg), precision=precision,
            data_parallel=data_parallel,
        )

    @classmethod
    def from_dir2(
        cls,
        model_dir: str | Path,
        hydra_overrides: list[str] | None = None,
        precision: str | None = None,
        data_parallel: bool = False,
    ):
        """Load with extra config overrides (reference model.py:339)."""
        model = cls.from_dir(
            model_dir, precision=precision, data_parallel=data_parallel
        )
        if hydra_overrides:
            model.cfg.apply_overrides(hydra_overrides)
        return model

    # -- output dir conventions (reference model.py:706-728) -------------------------

    def image_preds_dir(self) -> Path:
        return self.model_dir / "image_preds"

    def video_preds_dir(self) -> Path:
        return self.model_dir / "video_preds"

    def labeled_videos_dir(self) -> Path:
        return self.model_dir / "video_preds" / "labeled_videos"

    def cropped_data_dir(self) -> Path:
        """Where cropzoom-cropped images go (reference model.py:718-720)."""
        return self.model_dir / "cropped_images"

    def cropped_videos_dir(self) -> Path:
        """Where cropzoom-cropped videos go (reference model.py:722-724)."""
        return self.model_dir / "cropped_videos"

    def cropped_csv_file_path(self, csv_file_path: str | Path) -> Path:
        """``image_preds/<csv_name>/cropped_<csv_name>``
        (reference model.py:730-742)."""
        name = Path(csv_file_path).name
        return self.image_preds_dir() / name / ("cropped_" + name)

    @property
    def ckpt_path(self) -> str | None:
        return ckpt_path_from_base_path(
            str(self.model_dir), self.cfg.model.model_name
        )

    # -- lazy loading -----------------------------------------------------------------

    def _load(self) -> None:
        if self._predict_fn is not None:
            return
        import jax
        import jax.numpy as jnp

        from lightning_pose_tpu.data import bboxes as bboxes_mod
        from lightning_pose_tpu.models.factory import get_model
        from lightning_pose_tpu.ops.preprocess import normalize_images
        from lightning_pose_tpu.train import checkpoints as ckpt_utils
        from lightning_pose_tpu.train.trainer import TrainState

        cfg = self.cfg
        num_keypoints = cfg.data.num_keypoints
        precision = (self.precision or "bf16").lower()
        if precision in ("fp16", "16", "bf16", "bfloat16", "16-mixed"):
            compute_dtype = jnp.bfloat16
            if precision in ("fp16", "16"):
                logger.info("fp16 requested; using bfloat16 (TPU has no fp16)")
        elif precision in ("fp32", "32", "float32"):
            compute_dtype = jnp.float32
        else:
            raise ValueError(f"unknown precision {self.precision!r}")
        module, meta = get_model(
            cfg, num_keypoints=num_keypoints, compute_dtype=compute_dtype
        )
        self._module = module
        self._meta = meta

        ckpt_path = self.ckpt_path
        if ckpt_path is None:
            raise FileNotFoundError(f"no checkpoint found under {self.model_dir}")
        ckpt = ckpt_utils.load_checkpoint(ckpt_path)

        height = int(cfg.data.image_resize_dims.height)
        width = int(cfg.data.image_resize_dims.width)
        rng = jax.random.PRNGKey(0)
        if meta["model_type"] == "heatmap_mhcrnn":
            dummy = jnp.zeros((1, 5, height, width, 3), dtype=jnp.float32)
        elif meta["model_type"] == "heatmap_multiview":
            nv = int(meta.get("num_views", 1) or 1)
            dummy = jnp.zeros((1, nv, height, width, 3), dtype=jnp.float32)
        else:
            dummy = jnp.zeros((1, height, width, 3), dtype=jnp.float32)
        variables = module.init(rng, dummy, train=False)

        import flax.serialization

        params = flax.serialization.from_state_dict(
            variables["params"], ckpt["params"]
        )
        batch_stats = flax.serialization.from_state_dict(
            variables.get("batch_stats", {}), ckpt["batch_stats"]
        )
        # device_put ONCE: from_state_dict returns host (numpy) arrays, and
        # jitted calls do not cache host->device transfers of numpy args —
        # without this every predict call re-ships the full parameter set
        # (~100 MB for ResNet-50), which dominates wall time on
        # bandwidth-limited links
        self._state = jax.device_put(
            TrainState(
                step=jnp.asarray(ckpt.get("step", 0), dtype=jnp.int32),
                params=params,
                batch_stats=batch_stats,
                opt_state=None,
            )
        )

        is_heatmap = meta["model_type"].startswith("heatmap")
        is_context = meta["model_type"] == "heatmap_mhcrnn"
        ctx_repeat = (
            cfg.model.get("mhcrnn_context_mode", "adjacent") == "repeat_center"
        )
        num_views = int(meta.get("num_views", 1) or 1)

        # decode dispatch: reference-parity soft-argmax (default) or the
        # opt-in DARK Taylor-expansion decoder (ops/dark.py)
        decode_method = str(
            cfg.eval.get("decode_method", "softargmax")
        ).lower()
        if decode_method not in ("softargmax", "dark"):
            raise ValueError(
                f"cfg.eval.decode_method must be softargmax|dark, got "
                f"{decode_method!r}"
            )
        if decode_method == "dark":
            from lightning_pose_tpu.ops.dark import run_dark_decode

            df = int(cfg.data.get("downsample_factor", 2))

            def decode_fn(hms):
                return run_dark_decode(hms, downsample_factor=df)
        else:

            def decode_fn(hms):
                return module.decode(hms, fast=True)

        def predict_step(state, images_uint8, bbox):
            # fused Pallas uint8 -> normalized compute-dtype pass on TPU;
            # XLA normalize elsewhere (numerically equal up to dtype rounding).
            # 3-dim input = planar I420 video batches (half the transfer
            # bytes); converted to normalized RGB on device (ops/yuv.py)
            from lightning_pose_tpu.ops.preprocess import normalize_images_fused

            if images_uint8.ndim == 3:
                from lightning_pose_tpu.ops.yuv import i420_to_normalized_rgb

                images = i420_to_normalized_rgb(
                    images_uint8, out_dtype=compute_dtype
                )
            elif num_views > 1 and images_uint8.ndim == 4:
                # multiview I420: (T, V, H*3/2, W) -> (T, V, H, W, 3)
                from lightning_pose_tpu.ops.yuv import i420_to_normalized_rgb

                t_, v_ = images_uint8.shape[0], images_uint8.shape[1]
                flat = images_uint8.reshape(t_ * v_, *images_uint8.shape[2:])
                images = i420_to_normalized_rgb(
                    flat, out_dtype=compute_dtype
                ).reshape(t_, v_, -1, images_uint8.shape[3], 3)
            else:
                images = normalize_images_fused(
                    images_uint8, out_dtype=compute_dtype
                )
            vs = {"params": state.params, "batch_stats": state.batch_stats}
            if is_context:
                from lightning_pose_tpu.models.heatmap_tracker_mhcrnn import (
                    make_context_windows,
                    merge_heads_by_confidence,
                    repeat_center_stack,
                )

                if num_views > 1:
                    if images.ndim == 5:  # (T, V, H, W, 3) multiview video
                        images = make_context_windows(
                            images, repeat_center=ctx_repeat
                        ).transpose(
                            0, 2, 1, 3, 4, 5
                        )  # -> (T-4, V, 5, H, W, 3)
                    elif ctx_repeat and images.ndim == 6:
                        # pre-windowed (B, V, 5, h, w, 3) user stacks:
                        # normalize to repeated centers for train/inference
                        # consistency (idempotent on dataset-built stacks)
                        images = repeat_center_stack(images, time_axis=2)
                elif images.ndim == 4:
                    images = make_context_windows(
                        images, repeat_center=ctx_repeat
                    )
                elif ctx_repeat and images.ndim == 5:
                    # pre-windowed (B, 5, H, W, 3) stacks
                    images = repeat_center_stack(images, time_axis=1)
                hm_sf, hm_mf = module.apply(vs, images, train=False)
                kp_sf, conf_sf = decode_fn(hm_sf)
                kp_mf, conf_mf = decode_fn(hm_mf)
                preds, confs = merge_heads_by_confidence(
                    kp_sf, conf_sf, kp_mf, conf_mf
                )
            elif is_heatmap:
                heatmaps = module.apply(vs, images, train=False)
                preds, confs = decode_fn(heatmaps)
            else:
                preds = module.apply(vs, images, train=False)
                confs = jnp.ones((preds.shape[0], preds.shape[1] // 2))
            preds = bboxes_mod.model_to_frame_batch(
                preds, bbox, width, height, num_views=num_views
            )
            return preds, confs

        self._predict_fn = jax.jit(predict_step)
        # the device-side program, kept for export() (the data-parallel
        # wrapper below does host-side padding/device_put and cannot be
        # traced under jax.jit)
        self._base_predict_fn = self._predict_fn
        if self.data_parallel:
            self._enable_data_parallel()

    def _enable_data_parallel(self) -> None:
        """Shard prediction batches over all attached chips.

        TPU-native multi-chip inference (no reference counterpart — the
        reference pins ``pl.Trainer(devices=1)`` for prediction,
        reference utils/predictions.py:462): parameters are replicated on
        a 1-D ``data`` mesh, each incoming batch is committed with its
        frame axis sharded, and GSPMD partitions the jitted program —
        including the cross-frame context windows of MHCRNN models, whose
        halo frames XLA exchanges over ICI automatically. Batches whose
        frame count doesn't divide the mesh are padded by repeating the
        last frame and trimmed after (context windows never see the pad
        rows for the retained outputs)."""
        import jax
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        from lightning_pose_tpu.parallel.mesh import make_mesh

        if jax.device_count() < 2:
            logger.info("data_parallel requested but only one device attached")
            return
        mesh = make_mesh()
        n = mesh.size
        replicated = NamedSharding(mesh, P())
        sharded = NamedSharding(mesh, P("data"))
        self._state = jax.device_put(self._state, replicated)
        base_fn = self._predict_fn

        def dp_predict(state, images, bbox):
            images = np.asarray(images)
            bbox = np.asarray(bbox, dtype=np.float32)
            t = images.shape[0]
            pad = (-t) % n
            if pad:
                images = np.concatenate(
                    [images, np.repeat(images[-1:], pad, axis=0)]
                )
                bbox = np.concatenate(
                    [bbox, np.repeat(bbox[-1:], pad, axis=0)]
                )
            kp, conf = base_fn(
                state,
                jax.device_put(images, sharded),
                jax.device_put(bbox, sharded),
            )
            if pad:
                # output length tracks the (padded) frame axis (context
                # models emit T-4 windows); drop the pad-derived tail
                keep = kp.shape[0] - pad
                kp, conf = kp[:keep], conf[:keep]
            return kp, conf

        self._predict_fn = dp_predict
        self._dp_active = True
        logger.info(f"prediction batches sharded across {n} devices")

    # -- prediction entry points -----------------------------------------------------

    def predict_on_label_csv(
        self,
        csv_file: str | Path,
        data_dir: str | Path | None = None,
        compute_metrics: bool = True,
        add_train_val_test_set: bool = False,
        output_dir: str | Path | None = None,
        bbox_file: str | Path | None = None,
    ):
        """Predict all frames of a labeled CSV; write
        image_preds/<csv_name>/predictions.csv (reference model.py:958).

        ``bbox_file``: optional per-frame [x, y, h, w] CSV (e.g. from
        ``litpose create_bbox``); each frame is cropped to its bbox before
        inference and predictions are remapped to original-frame
        coordinates (reference model.py:975-980).

        ``add_train_val_test_set``: when True, the training splits are
        recreated (seeded) so the output ``set`` column reflects the real
        train/validation/test assignment; when False (default) every frame
        is marked ``train`` (the reference's train_prob=1/val_prob=0/
        train_frames=1 override, reference model.py:1016-1019)."""
        if self.config.is_multi_view():
            raise ValueError(
                "this is a multiview model; use predict_on_label_csv_multiview "
                "with one CSV per view"
            )
        self._load()
        from lightning_pose_tpu.data.datamodules import BaseDataModule
        from lightning_pose_tpu.data.datasets import HeatmapDataset
        from lightning_pose_tpu.utils.predictions import PredictionHandler

        cfg = self.cfg.copy()
        if not add_train_val_test_set:
            cfg.training.train_prob = 1
            cfg.training.val_prob = 0
            cfg.training.train_frames = 1
        data_dir = str(data_dir or cfg.data.data_dir)
        csv_file = str(csv_file)

        dataset = HeatmapDataset(
            root_directory=data_dir,
            csv_path=csv_file,
            image_resize_height=cfg.data.image_resize_dims.height,
            image_resize_width=cfg.data.image_resize_dims.width,
            imgaug_pipeline="default",
            do_context=(cfg.model.model_type == "heatmap_mhcrnn"),
            # honor the trained context source (train/eval consistency for
            # models trained with mhcrnn_context_mode=repeat_center)
            context_mode=cfg.model.get("mhcrnn_context_mode", "adjacent"),
            downsample_factor=int(cfg.data.get("downsample_factor", 2)),
            bbox_path=str(bbox_file) if bbox_file else None,
        )
        data_module = BaseDataModule(
            dataset=dataset,
            train_batch_size=cfg.training.train_batch_size,
            val_batch_size=cfg.training.val_batch_size,
            test_batch_size=cfg.training.test_batch_size,
            train_probability=cfg.training.train_prob,
            val_probability=cfg.training.get("val_prob", None),
            torch_seed=cfg.training.get("rng_seed_data_pt", 42),
        )
        if cfg.data.get("keypoint_names", None) is None:
            cfg.data.keypoint_names = list(dataset.keypoint_names)

        preds = []
        for batch in data_module.full_batches():
            kp, conf = self._predict_fn(self._state, batch["images"], batch["bbox"])
            valid = batch["valid"]
            preds.append((np.asarray(kp)[valid], np.asarray(conf)[valid]))
        handler = PredictionHandler(cfg=cfg, data_module=data_module)
        df = handler(preds)
        # the written CSV always keeps the 'set' column — metrics key the
        # labeled-vs-video dispatch off it (reference metrics.py:211-216)

        out_dir = Path(output_dir) if output_dir else (
            self.image_preds_dir() / Path(csv_file).name
        )
        out_dir.mkdir(parents=True, exist_ok=True)
        preds_file = out_dir / "predictions.csv"
        df.to_csv(preds_file)

        metrics_result = None
        if compute_metrics:
            from lightning_pose_tpu.metrics import compute_metrics_single

            labels_file = Path(csv_file)
            if not labels_file.is_absolute():
                labels_file = Path(data_dir) / labels_file
            try:
                metrics_result = compute_metrics_single(
                    cfg=cfg,
                    labels_file=str(labels_file),
                    preds_file=str(preds_file),
                    data_module=data_module,
                )
            except Exception as e:
                logger.warning(f"metrics computation failed: {e}")
        from lightning_pose_tpu.data.datatypes import PredictionResult

        return PredictionResult(predictions=df, metrics=metrics_result)

    def predict_on_video_file(
        self,
        video_file: str | Path,
        compute_metrics: bool = True,
        generate_labeled_video: bool = False,
        output_dir: str | Path | None = None,
        bbox_df=None,
        bbox_file: str | Path | None = None,
        progress_file: str | Path | None = None,
    ):
        """Predict a video; write video_preds/<stem>.csv
        (reference model.py:1139). ``bbox_file`` (per-frame x,y,h,w CSV) or
        ``bbox_df`` enables bbox-crop inference; ``progress_file`` writes
        per-batch App progress JSON.

        Frames move host->device as planar 4:2:0 YUV on TPU (half the
        transfer bytes, converted on device — the analog of DALI shipping
        the compressed stream to the GPU, reference dali.py:70-124);
        override with ``cfg.eval.video_transfer_format: rgb|yuv420``."""
        self._load()
        from lightning_pose_tpu.utils.video_predictions import predict_video

        if bbox_file is not None:
            if bbox_df is not None:
                raise ValueError("pass bbox_file or bbox_df, not both")
            import pandas as pd

            bbox_df = pd.read_csv(bbox_file, index_col=0)
        preds_file = None
        if output_dir:
            preds_file = str(Path(output_dir) / (Path(video_file).stem + ".csv"))
        return predict_video(
            video_file=str(video_file),
            cfg=self.cfg,
            predict_fn=self._predict_fn,
            state=self._state,
            model_dir=str(self.model_dir),
            preds_file=preds_file,
            generate_labeled_video=generate_labeled_video,
            compute_metrics=compute_metrics,
            bbox_df=bbox_df,
            progress_file=progress_file,
            transfer_format=self._video_transfer_format(),
            # the dp wrapper pads + shards its own (host) inputs: a
            # prefetched single-device commit would bounce back to host
            prefetch=not getattr(self, "_dp_active", False),
        )

    def _video_transfer_format(self) -> str:
        """Resolve cfg.eval.video_transfer_format (default 'auto'):
        'yuv420' on TPU backends, 'rgb' elsewhere and for exported
        runtimes (their serialized input shapes are RGB)."""
        if getattr(self, "_exported_runtime_active", False):
            return "rgb"
        fmt = str(self.cfg.eval.get("video_transfer_format", "auto")).lower()
        if fmt == "auto":
            import jax

            return "yuv420" if jax.default_backend() == "tpu" else "rgb"
        if fmt not in ("rgb", "yuv420"):
            raise ValueError(
                f"cfg.eval.video_transfer_format must be rgb|yuv420|auto, "
                f"got {fmt!r}"
            )
        return fmt

    def predict_on_video_file_multiview(
        self,
        video_file_per_view: list[str | Path],
        compute_metrics: bool = True,
        generate_labeled_video: bool = False,
        output_dir: str | Path | None = None,
        progress_file: str | Path | None = None,
    ):
        """Frame-synchronized multiview video inference
        (reference model.py:1225). ``output_dir`` overrides the default
        ``video_preds/`` location; ``progress_file`` writes per-batch App
        progress JSON. Returns a
        :class:`~lightning_pose_tpu.data.datatypes.MultiviewPredictionResult`."""
        if not self.config.is_multi_view():
            raise ValueError(
                "this is a single-view model; use predict_on_video_file"
            )
        if len(video_file_per_view) != len(self.cfg.data.view_names):
            raise ValueError(
                f"got {len(video_file_per_view)} videos for "
                f"{len(self.cfg.data.view_names)} views"
            )
        self._load()
        from lightning_pose_tpu.utils.video_predictions import (
            predict_video_multiview,
        )

        return predict_video_multiview(
            video_file_per_view=[str(v) for v in video_file_per_view],
            view_names=list(self.cfg.data.view_names),
            cfg=self.cfg,
            predict_fn=self._predict_fn,
            state=self._state,
            model_dir=str(self.model_dir),
            generate_labeled_video=generate_labeled_video,
            compute_metrics=compute_metrics,
            transfer_format=self._video_transfer_format(),
            output_dir=str(output_dir) if output_dir else None,
            progress_file=progress_file,
            prefetch=not getattr(self, "_dp_active", False),
        )

    def predict_on_label_csv_multiview(
        self,
        csv_file_per_view: list[str | Path],
        data_dir: str | Path | None = None,
        compute_metrics: bool = True,
        add_train_val_test_set: bool = False,
        **kwargs,
    ):
        """Predict all frames of per-view labeled CSVs
        (reference model.py:1052). ``add_train_val_test_set`` as in
        :meth:`predict_on_label_csv` (reference model.py:1102)."""
        if not self.config.is_multi_view():
            raise ValueError(
                "this is a single-view model; use predict_on_label_csv"
            )
        if len(csv_file_per_view) != len(self.cfg.data.view_names):
            raise ValueError(
                f"got {len(csv_file_per_view)} CSVs for "
                f"{len(self.cfg.data.view_names)} views"
            )
        self._load()
        from lightning_pose_tpu.data.datamodules import BaseDataModule
        from lightning_pose_tpu.data.datasets_multiview import MultiviewHeatmapDataset
        from lightning_pose_tpu.utils.predictions import PredictionHandler

        cfg = self.cfg.copy()
        if not add_train_val_test_set:
            cfg.training.train_prob = 1
            cfg.training.val_prob = 0
            cfg.training.train_frames = 1
        data_dir = str(data_dir or cfg.data.data_dir)
        cfg.data.csv_file = [str(c) for c in csv_file_per_view]
        dataset = MultiviewHeatmapDataset(
            cfg=cfg, data_dir=data_dir, imgaug_pipeline="default",
            do_context=(cfg.model.model_type == "heatmap_mhcrnn"),
        )
        data_module = BaseDataModule(
            dataset=dataset,
            train_batch_size=cfg.training.train_batch_size,
            val_batch_size=cfg.training.val_batch_size,
            test_batch_size=cfg.training.test_batch_size,
            train_probability=cfg.training.train_prob,
            val_probability=cfg.training.get("val_prob", None),
            torch_seed=cfg.training.get("rng_seed_data_pt", 42),
        )
        preds = []
        for batch in data_module.full_batches():
            kp, conf = self._predict_fn(self._state, batch["images"], batch["bbox"])
            valid = batch["valid"]
            preds.append((np.asarray(kp)[valid], np.asarray(conf)[valid]))
        handler = PredictionHandler(cfg=cfg, data_module=data_module)
        view_to_df = handler(preds)

        out = {}
        out_metrics: dict[str, object] = {}
        for view_name, csv_file in zip(cfg.data.view_names, cfg.data.csv_file):
            df = view_to_df[view_name]
            out_dir = self.image_preds_dir() / Path(csv_file).name
            out_dir.mkdir(parents=True, exist_ok=True)
            preds_file = out_dir / "predictions.csv"
            df.to_csv(preds_file)
            out[view_name] = df
            if compute_metrics:
                from lightning_pose_tpu.metrics import compute_metrics_single

                labels_file = Path(csv_file)
                if not labels_file.is_absolute():
                    labels_file = Path(data_dir) / labels_file
                try:
                    out_metrics[view_name] = compute_metrics_single(
                        cfg=cfg,
                        labels_file=str(labels_file),
                        preds_file=str(preds_file),
                        data_module=data_module,
                    )
                except Exception as e:
                    logger.warning(f"metrics failed ({view_name}): {e}")
        from lightning_pose_tpu.data.datatypes import MultiviewPredictionResult

        return MultiviewPredictionResult(
            predictions=out, metrics=out_metrics or None
        )

    def predict_frame(
        self,
        frame_rgb: np.ndarray,
        bbox: tuple[int, int, int, int] | None = None,
    ) -> dict[str, np.ndarray]:
        """Single-frame inference, no file IO (reference model.py:747-960).

        Args:
            frame_rgb: ``(H, W, 3)`` uint8 RGB array for standard models;
                ``(T, H, W, 3)`` for context (MHCRNN) models (T is the
                temporal context length, typically 5); ``(V, H, W, 3)`` for
                multiview models (one frame per view, cfg view order).
            bbox: optional ``(x, y, w, h)`` crop region; keypoints are
                remapped back to original frame coordinates.

        Returns:
            {"keypoints": (K, 2) float32 (x, y) original-frame coords
             (view-major for multiview), "confidence": (K,) float32}.
        """
        self._load()
        import cv2

        if frame_rgb.dtype != np.uint8:
            raise ValueError(
                f"frame_rgb must be uint8, got {frame_rgb.dtype}. "
                "Convert with frame.astype(np.uint8) if values are in [0, 255]."
            )
        is_stack_input = frame_rgb.ndim >= 4
        if frame_rgb.ndim not in (3, 4, 5) or frame_rgb.shape[-1] != 3:
            raise ValueError(
                f"frame_rgb must be (H, W, 3), (T, H, W, 3), or "
                f"(V, T, H, W, 3), got shape {frame_rgb.shape}"
            )
        if frame_rgb.size == 0:
            raise ValueError("frame_rgb is empty")

        from lightning_pose_tpu.models.factory import normalize_model_type

        model_type = normalize_model_type(str(self.cfg.model.model_type))
        is_context_model = model_type == "heatmap_mhcrnn"
        nv = int(self._meta.get("num_views", 1) or 1)
        # transformer OR a plain heatmap tracker trained on multiview data —
        # both take one frame per view
        is_multiview_model = model_type == "heatmap_multiview" or (
            nv > 1 and not is_context_model
        )
        is_mv_context = is_context_model and nv > 1
        if is_mv_context:
            if frame_rgb.ndim != 5 or frame_rgb.shape[0] != nv:
                raise ValueError(
                    f"Multiview context model requires frame_rgb of shape "
                    f"({nv}, T, H, W, 3): one temporal context stack per "
                    f"view in cfg order."
                )
        elif is_context_model and frame_rgb.ndim != 4:
            raise ValueError(
                "Context model requires frame_rgb of shape (T, H, W, 3) "
                "where T is the temporal context length (typically 5). "
                "Use predict_on_video_file for single-frame input."
            )
        if is_multiview_model:
            if frame_rgb.ndim != 4 or frame_rgb.shape[0] != nv:
                raise ValueError(
                    f"Multiview model requires frame_rgb of shape "
                    f"({nv}, H, W, 3), one frame per view in cfg order."
                )

        # crop (x, y, w, h), remembering actual crop dims for the remap
        if bbox is not None:
            bx, by, bw, bh = bbox
            if bx < 0 or by < 0:
                raise ValueError(
                    f"bbox origin must be non-negative, got x={bx}, y={by}"
                )
            if bw <= 0 or bh <= 0:
                raise ValueError(
                    f"bbox width and height must be positive, got w={bw}, h={bh}"
                )
            if frame_rgb.ndim == 5:
                crop = frame_rgb[:, :, by:by + bh, bx:bx + bw]
            elif is_stack_input:
                crop = frame_rgb[:, by:by + bh, bx:bx + bw]
            else:
                crop = frame_rgb[by:by + bh, bx:bx + bw]
            if crop.size == 0:
                raise ValueError(
                    f"bbox (x={bx}, y={by}, w={bw}, h={bh}) produces an "
                    f"empty crop on frame of shape {frame_rgb.shape}"
                )
            actual_h, actual_w = crop.shape[-3], crop.shape[-2]
            bbox_lp = np.array(
                [[bx, by, actual_h, actual_w]], dtype=np.float32
            )
        else:
            crop = frame_rgb
            fh, fw = frame_rgb.shape[-3], frame_rgb.shape[-2]
            bbox_lp = np.array([[0.0, 0.0, fh, fw]], dtype=np.float32)

        height = int(self.cfg.data.image_resize_dims.height)
        width = int(self.cfg.data.image_resize_dims.width)

        def resize(img):
            return cv2.resize(img, (width, height), interpolation=cv2.INTER_LINEAR)

        if frame_rgb.ndim == 5:  # (V, T, H, W, 3) multiview context stacks
            images = np.stack(
                [
                    np.stack([resize(crop[v, t]) for t in range(crop.shape[1])])
                    for v in range(crop.shape[0])
                ]
            )[None]  # (1, V, T, h, w, 3)
        elif is_stack_input:
            images = np.stack([resize(crop[i]) for i in range(crop.shape[0])])[None]
        else:
            images = resize(crop)[None]
        if is_multiview_model or is_mv_context:
            # per-view bbox slices (all views share the frame/crop dims here)
            bbox_lp = np.tile(bbox_lp[:, None, :], (1, images.shape[1], 1))

        kp, conf = self._predict_fn(self._state, images, bbox_lp)
        kp = np.asarray(kp)[0].reshape(-1, 2).astype(np.float32)
        return {
            "keypoints": kp,
            "confidence": np.asarray(conf)[0].astype(np.float32),
        }

    # -- export / compile -------------------------------------------------------------

    def compile(self) -> None:
        """Eagerly compile the prediction program (torch.compile analog,
        reference model.py:409). jit compilation happens on first call; this
        just triggers it with the canonical video batch shape."""
        self._load()
        import jax.numpy as jnp

        height = int(self.cfg.data.image_resize_dims.height)
        width = int(self.cfg.data.image_resize_dims.width)
        seq_key = (
            "context"
            if self._meta["model_type"] == "heatmap_mhcrnn"
            else "base"
        )
        seq_len = int(self.cfg.dali[seq_key]["predict"]["sequence_length"])
        nv = int(self._meta.get("num_views", 1) or 1)
        if nv > 1:
            dummy = jnp.zeros((seq_len, nv, height, width, 3), dtype=jnp.uint8)
            bbox = jnp.tile(
                jnp.asarray([0.0, 0.0, height, width] * nv), (seq_len, 1)
            )
        else:
            dummy = jnp.zeros((seq_len, height, width, 3), dtype=jnp.uint8)
            bbox = jnp.tile(jnp.asarray([0.0, 0.0, height, width]), (seq_len, 1))
        self._predict_fn(self._state, dummy, bbox)

    def export(self, output_dir: str | Path | None = None) -> str:
        """Serialize the jitted prediction program with ``jax.export`` —
        the XLA-AOT analog of ONNX export (reference model.py:615-704)."""
        self._load()
        import jax
        import jax.numpy as jnp
        from jax import export as jax_export

        height = int(self.cfg.data.image_resize_dims.height)
        width = int(self.cfg.data.image_resize_dims.width)
        seq_key = (
            "context"
            if self._meta["model_type"] == "heatmap_mhcrnn"
            else "base"
        )
        seq_len = int(self.cfg.dali[seq_key]["predict"]["sequence_length"])
        out_dir = Path(output_dir or (self.model_dir / "exports_xla"))
        out_dir.mkdir(parents=True, exist_ok=True)

        # always the device-side program: the data-parallel wrapper is
        # host-side (np padding + device_put) and cannot be traced; and a
        # mesh-replicated state would bake multi-device shardings into the
        # export, so materialize it to host first in that case
        state = jax.device_get(self._state) if self.data_parallel else self._state

        def fn(images, bbox):
            return self._base_predict_fn(state, images, bbox)

        # canonical RGB video-batch shapes per model family (the reference
        # likewise traces its ONNX export per model shape, model.py:615-704)
        nv = int(self._meta.get("num_views", 1) or 1)
        if nv > 1:
            images_spec = jax.ShapeDtypeStruct(
                (seq_len, nv, height, width, 3), jnp.uint8
            )
            bbox_spec = jax.ShapeDtypeStruct((seq_len, 4 * nv), jnp.float32)
        else:
            images_spec = jax.ShapeDtypeStruct(
                (seq_len, height, width, 3), jnp.uint8
            )
            bbox_spec = jax.ShapeDtypeStruct((seq_len, 4), jnp.float32)
        exported = jax_export.export(jax.jit(fn))(images_spec, bbox_spec)
        path = out_dir / "predict.jax_export"
        with open(path, "wb") as f:
            f.write(exported.serialize())
        logger.info(f"exported serialized XLA program to {path}")
        return str(path)

    def use_exported_runtime(self, path: str | Path | None = None) -> None:
        """Route predictions through a serialized XLA export instead of the
        live checkpoint (the reference's ``--runtime onnx``,
        model.py:469-594). ``path`` defaults to the single ``.jax_export``
        under ``<model_dir>/exports_xla``.

        The exported program has fixed input shapes
        ``(sequence_length, H, W, 3)`` — it serves the video path; other
        batch shapes raise with a pointer back to the eager runtime.
        """
        self._load()
        if path is None:
            candidates = sorted(
                (self.model_dir / "exports_xla").glob("*.jax_export")
            )
            if len(candidates) != 1:
                raise FileNotFoundError(
                    f"expected exactly one .jax_export under "
                    f"{self.model_dir / 'exports_xla'}, found "
                    f"{len(candidates)}; run `litpose export` first or pass "
                    "an explicit path"
                )
            path = candidates[0]
        fn = Model.load_exported(path)
        expected = tuple(fn.__self__.in_avals[0].shape)  # (T, H, W, 3)

        def exported_predict(state, images_uint8, bbox):
            import jax.numpy as jnp

            images_uint8 = jnp.asarray(images_uint8)
            if tuple(images_uint8.shape) != expected:
                raise ValueError(
                    f"exported program expects images {expected}, got "
                    f"{tuple(images_uint8.shape)}; use the eager runtime for "
                    "non-video batch shapes"
                )
            return fn(
                images_uint8.astype(jnp.uint8),
                jnp.asarray(bbox, jnp.float32),
            )

        self._predict_fn = exported_predict
        self._exported_runtime_active = True
        logger.info(f"predictions now run the exported program at {path}")

    @staticmethod
    def load_exported(path: str | Path):
        """Load a serialized XLA prediction program (the ORT-runtime analog,
        reference model.py:469-594). Returns a callable
        ``(images_uint8, bbox) -> (keypoints, confidences)``."""
        from jax import export as jax_export

        with open(path, "rb") as f:
            exported = jax_export.deserialize(bytearray(f.read()))
        return exported.call
