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

    def __init__(
        self, cfg, data_dir: str, imgaug_pipeline=None, do_context: bool = False
    ) -> None:
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
                do_context=do_context,
                context_mode=cfg.model.get("mhcrnn_context_mode", "adjacent"),
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
        self.do_context = bool(do_context)
        self.imgaug_pipeline = imgaug_pipeline
        self.hflip_swap_indices = np.arange(self.num_keypoints, dtype=np.intp)
        self.downsample_factor = first.downsample_factor
        # per-view image names for PredictionHandler indexing
        self.image_names_by_view = {
            view: self.view_datasets[view].image_names for view in view_names
        }
        # flat list used by single-view-style consumers
        self.image_names = first.image_names

        # optional camera calibration (reference datasets.py:674-760).
        # Three input formats, in the reference's precedence order:
        # 1) camera_params_file = frame-map CSV (index = image paths, 'file'
        #    column = anipose calibration TOML per frame/session) — the
        #    reference's native format (datasets.py:674-697)
        # 2) camera_params_file = a single anipose TOML, or the legacy
        #    one-row-per-view K/RT/d CSV (this repo's round-1 extra format)
        # 3) no camera_params_file: path-based discovery from
        #    labeled-data/<session>_<view>/ -> calibrations/<session>.toml,
        #    falling back to calibration.toml (datasets.py:698-760)
        self.root_directory = data_dir
        self.camera_params = None  # single calibration shared by all frames
        self._calib_by_file: dict[str, dict] = {}
        self._calib_file_per_frame: list[str] | None = None
        cam_file = cfg.data.get("camera_params_file", None)
        if cam_file and self.do_context:
            # 3D augmentations are not supported for context models
            # (reference datasets.py:686,748 asserts; discovery likewise
            # raises, reference tests test_discover_do_context_raises_*)
            raise ValueError(
                "3D augmentations (camera_params_file) are not supported "
                "for context (heatmap_mhcrnn) models"
            )
        if cam_file:
            path = cam_file if os.path.isabs(cam_file) else os.path.join(data_dir, cam_file)
            if not os.path.exists(path):
                logger.warning(f"camera_params_file not found: {path}")
            elif str(path).endswith(".toml"):
                self.camera_params = self._load_calib_toml(str(path))
            else:
                import pandas as pd

                df = pd.read_csv(path, index_col=0)
                if "file" in df.columns:
                    self._load_cam_params_from_frame_map(df)
                else:
                    self.camera_params = self._load_cam_params_from_csv(path)
        else:
            self._discover_cam_params_from_image_paths()

    # -- calibration loading ------------------------------------------------------

    def _load_calib_toml(self, path: str) -> dict:
        """Load an anipose TOML, checking camera names against view_names
        (reference datasets.py:656-672)."""
        from lightning_pose_tpu.data.anipose import load_anipose_toml

        calib = load_anipose_toml(path)
        if calib["names"] != list(self.view_names):
            raise ValueError(
                "cfg.data.view_names must have same camera order as camera "
                f"calibration file; instead found {list(self.view_names)} and "
                f"{calib['names']} in {path}."
            )
        return calib

    def _load_cam_params_from_frame_map(self, df) -> None:
        """Reference frame-map CSV: one row per labeled frame, 'file' column
        names the anipose TOML (relative to the data dir). Frame order must
        match the first view's image names (reference datasets.py:674-697)."""
        img_idxs_labels = [i.split("/")[-1] for i in self.image_names]
        img_idxs_calib = [str(i).split("/")[-1] for i in df.index]
        if img_idxs_labels != img_idxs_calib:
            raise ValueError(
                "camera_params_file rows must match the label CSV frames "
                "(same order, same filenames)"
            )
        files = [str(f) for f in df["file"]]
        for f in set(files):
            path = f if os.path.isabs(f) else os.path.join(self.root_directory, f)
            self._calib_by_file[f] = self._load_calib_toml(path)
        self._calib_file_per_frame = files

    def _discover_cam_params_from_image_paths(self) -> None:
        """Per-session TOML discovery from image paths
        (reference datasets.py:698-760): labeled-data/<session>_<view>/img.ext
        -> calibrations/<session>.toml, else calibration.toml; disabled
        entirely if any frame has no calibration."""
        files: list[str | None] = []
        all_found = True
        for img_name in self.image_names:
            parts = img_name.replace("\\", "/").split("/")
            try:
                ld_idx = parts.index("labeled-data")
                folder = parts[ld_idx + 1]
            except (ValueError, IndexError) as err:
                # malformed layout is an error, not "no calibration"
                # (reference datasets.py:716-724 raises)
                raise ValueError(
                    f"Image path '{img_name}' does not match expected pattern "
                    "labeled-data/<session>_<view>/img<frameidx>.ext"
                ) from err
            if "_" not in folder:
                raise ValueError(
                    f"Folder '{folder}' in image path '{img_name}' does not "
                    "match expected pattern <session>_<view>"
                )
            session = folder.rsplit("_", 1)[0]
            by_session = os.path.join("calibrations", f"{session}.toml")
            if os.path.exists(os.path.join(self.root_directory, by_session)):
                files.append(by_session)
            elif os.path.exists(os.path.join(self.root_directory, "calibration.toml")):
                files.append("calibration.toml")
            else:
                # keep scanning: a later frame may still have calibration,
                # in which case the reference warns (datasets.py:740-758)
                all_found = False
                files.append(None)
        found = {f for f in files if f is not None}
        if found and not all_found:
            logger.warning(
                "calibration file not found for some frames; "
                "disabling 3D for entire dataset"
            )
            return
        if not found:
            return
        try:
            for f in found:
                self._calib_by_file[f] = self._load_calib_toml(
                    os.path.join(self.root_directory, f)
                )
        except ValueError as e:
            logger.warning(f"calibration load failed: {e}")
            self._calib_by_file = {}
            return
        self._calib_file_per_frame = files
        if files:
            if self.do_context:
                raise ValueError(
                    "found anipose calibration for this dataset, but 3D "
                    "augmentations are not supported for context "
                    "(heatmap_mhcrnn) models; remove the calibration files "
                    "or use model_type heatmap_multiview_transformer"
                )
            logger.info(
                f"discovered anipose calibration for {len(files)} frames "
                f"({len(self._calib_by_file)} file(s))"
            )

    @property
    def is_calibrated(self) -> bool:
        return self.camera_params is not None or (
            self._calib_file_per_frame is not None
        )

    def frame_calibration(self, idx: int) -> dict | None:
        """Camera arrays for frame ``idx`` (per-frame TOML mapping when
        present, else the shared calibration), or None."""
        if self._calib_file_per_frame is not None:
            return self._calib_by_file[self._calib_file_per_frame[idx]]
        return self.camera_params

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
            # (V, H, W, 3), or (V, 5, H, W, 3) for context models
            "images": np.stack(images),
            "keypoints": np.concatenate(keypoints, axis=0),  # (V*K, 2) view-major
            "visibility": np.concatenate(vis, axis=0),
            "bbox": np.concatenate(bboxes, axis=0),  # (V*4,)
            "idx": idx,
            "num_views": len(self.view_names),
        }
        calib = self.frame_calibration(idx)
        if calib is not None:
            sample["intrinsic_matrix"] = calib["intrinsics"]
            sample["extrinsic_matrix"] = calib["extrinsics"]
            sample["distortions"] = calib["distortions"]
        return sample
