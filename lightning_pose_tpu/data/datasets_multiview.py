"""Multiview dataset: per-view child datasets fused into (V, ...) samples
(reference lightning_pose/data/datasets.py:525-1200 MultiviewHeatmapDataset).

Each view has its own label CSV; cross-view consistency (same keypoint
names, same frame count, aligned sessions) is validated up front (reference
datasets.py:600-670). Samples fuse per-view images/keypoints/bboxes with a
**view-major** keypoint layout matching the model head's channel order.

Camera calibration (optional, ``camera_params_file`` CSV) loads per-view
intrinsic/extrinsic/distortion arrays; with calibration present the
trainer applies the batched 3D scale/translate augmentation on device
(ops/augment3d.py, the reference's triangulate -> perturb -> reproject ->
warp pipeline, reference datasets.py:825-1120) plus the supervised 3D
losses.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from lightning_pose_tpu.data.datasets import HeatmapDataset

logger = logging.getLogger(__name__)

__all__ = ["MultiviewHeatmapDataset"]


class MultiviewHeatmapDataset:
    """Fuses per-view HeatmapDatasets; len = number of sessions (frames)."""

    def __init__(self, cfg, data_dir: str, imgaug_pipeline=None) -> None:
        view_names = list(cfg.data.view_names)
        csv_files = cfg.data.csv_file
        if isinstance(csv_files, str):
            raise ValueError(
                "multiview datasets require one csv_file per view (a list)"
            )
        csv_files = list(csv_files)
        assert len(csv_files) == len(view_names), (
            f"{len(csv_files)} csv files != {len(view_names)} views"
        )
        self.view_names = view_names
        self.cfg = cfg

        height = cfg.data.image_resize_dims.height
        width = cfg.data.image_resize_dims.width
        bbox_files = cfg.data.get("bbox_file", None)

        self.view_datasets: dict[str, HeatmapDataset] = {}
        for i, (view, csv_file) in enumerate(zip(view_names, csv_files)):
            self.view_datasets[view] = HeatmapDataset(
                root_directory=data_dir,
                csv_path=csv_file,
                image_resize_height=height,
                image_resize_width=width,
                imgaug_pipeline=imgaug_pipeline,
                downsample_factor=int(cfg.data.get("downsample_factor", 2)),
                bbox_path=bbox_files[i] if bbox_files else None,
            )

        # cross-view consistency checks (reference datasets.py:600-670)
        first = self.view_datasets[view_names[0]]
        for view in view_names[1:]:
            ds = self.view_datasets[view]
            if ds.keypoint_names != first.keypoint_names:
                raise ValueError(
                    f"keypoint names differ between views {view_names[0]} and {view}"
                )
            if len(ds) != len(first):
                raise ValueError(
                    f"frame counts differ between views: {len(first)} vs {len(ds)}"
                )

        self.keypoint_names = first.keypoint_names
        self.num_keypoints_per_view = first.num_keypoints
        self.num_keypoints = first.num_keypoints * len(view_names)
        self.num_targets = self.num_keypoints * 2
        self.do_context = False
        self.imgaug_pipeline = imgaug_pipeline
        self.hflip_swap_indices = np.arange(self.num_keypoints, dtype=np.intp)
        self.downsample_factor = first.downsample_factor
        # per-view image names for PredictionHandler indexing
        self.image_names_by_view = {
            view: self.view_datasets[view].image_names for view in view_names
        }
        # flat list used by single-view-style consumers
        self.image_names = first.image_names

        # optional camera calibration (reference datasets.py:674-760)
        self.camera_params = None
        cam_file = cfg.data.get("camera_params_file", None)
        if cam_file:
            path = cam_file if os.path.isabs(cam_file) else os.path.join(data_dir, cam_file)
            if os.path.exists(path):
                self.camera_params = self._load_cam_params_from_csv(path)
            else:
                logger.warning(f"camera_params_file not found: {path}")

    def _load_cam_params_from_csv(self, path: str) -> dict:
        """Load per-view intrinsics (3x3), extrinsics (3x4), distortion (5,)
        from a calibration CSV with one row per view."""
        import pandas as pd

        df = pd.read_csv(path, index_col=0)
        intr, extr, dist = [], [], []
        for view in self.view_names:
            row = df.loc[view]
            intr.append(np.asarray(row[[f"K{i}{j}" for i in range(3) for j in range(3)]],
                                   dtype=np.float32).reshape(3, 3))
            extr.append(np.asarray(row[[f"RT{i}{j}" for i in range(3) for j in range(4)]],
                                   dtype=np.float32).reshape(3, 4))
            dist.append(np.asarray(row[[f"d{i}" for i in range(5)]], dtype=np.float32))
        return {
            "intrinsics": np.stack(intr),
            "extrinsics": np.stack(extr),
            "distortions": np.stack(dist),
        }

    def __len__(self) -> int:
        return len(self.view_datasets[self.view_names[0]])

    def keypoints_resized(self, idx: int) -> np.ndarray:
        """Fused (V*K, 2) view-major resized keypoints (for PCA fitting)."""
        return np.concatenate(
            [self.view_datasets[v].keypoints_resized(idx) for v in self.view_names],
            axis=0,
        )

    def __getitem__(self, idx: int) -> dict:
        images, keypoints, vis, bboxes = [], [], [], []
        for view in self.view_names:
            s = self.view_datasets[view][idx]
            images.append(s["images"])
            keypoints.append(s["keypoints"])
            vis.append(s["visibility"])
            bboxes.append(s["bbox"])
        sample = {
            "images": np.stack(images),  # (V, H, W, 3)
            "keypoints": np.concatenate(keypoints, axis=0),  # (V*K, 2) view-major
            "visibility": np.concatenate(vis, axis=0),
            "bbox": np.concatenate(bboxes, axis=0),  # (V*4,)
            "idx": idx,
            "num_views": len(self.view_names),
        }
        if self.camera_params is not None:
            sample["intrinsic_matrix"] = self.camera_params["intrinsics"]
            sample["extrinsic_matrix"] = self.camera_params["extrinsics"]
            sample["distortions"] = self.camera_params["distortions"]
        return sample
