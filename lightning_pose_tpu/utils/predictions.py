"""Prediction handling: batch outputs -> DLC-format CSVs
(reference lightning_pose/utils/predictions.py:39-327).

Output fidelity contract: 3-level (scorer/bodyparts/coords) MultiIndex
columns with x/y/likelihood per keypoint, image-name index + ``set`` column
for labeled datasets, frame-count trimming and context shift-by-2 fixes for
video (reference predictions.py:117-175).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

from lightning_pose_tpu.utils.io import make_dlc_pandas_index

logger = logging.getLogger(__name__)

__all__ = ["PredictionHandler", "predict_dataset"]


def predict_dataset(
    cfg,
    data_module,
    predict_fn,
    state,
    preds_file: str | None = None,
) -> pd.DataFrame | dict[str, pd.DataFrame]:
    """Predict every frame of a labeled dataset and optionally write the CSV
    (reference predictions.py:330 ``predict_dataset``).

    Args:
        predict_fn: jitted ``(state, images, bbox) -> (keypoints, confs)``.
    """
    preds = []
    for batch in data_module.full_batches():
        kp, conf = predict_fn(state, batch["images"], batch["bbox"])
        valid = batch["valid"]
        preds.append((np.asarray(kp)[valid], np.asarray(conf)[valid]))
    handler = PredictionHandler(cfg=cfg, data_module=data_module)
    result = handler(preds)
    if preds_file is not None:
        if isinstance(result, dict):
            for view, df in result.items():
                df.to_csv(str(preds_file).replace(".csv", f"_{view}.csv"))
        else:
            result.to_csv(preds_file)
    return result


class PredictionHandler:
    """Convert stacked (keypoints, confidences) arrays into prediction
    dataframes."""

    def __init__(self, cfg, data_module=None, video_file: str | None = None) -> None:
        if data_module is None and video_file is None:
            raise ValueError("must pass either data_module or video_file")
        if cfg.data.get("keypoint_names", None) is None:
            raise ValueError("must include `keypoint_names` field in cfg.data")
        self.cfg = cfg
        self.data_module = data_module
        self.video_file = video_file

    @property
    def frame_count(self) -> int:
        if self.video_file is not None:
            from lightning_pose_tpu.data.video import count_frames

            return count_frames(self.video_file)
        return len(self.data_module.dataset)

    @property
    def keypoint_names(self) -> list[str]:
        return list(self.cfg.data.keypoint_names)

    @property
    def do_context(self) -> bool:
        if self.data_module is not None:
            return bool(getattr(self.data_module.dataset, "do_context", False))
        return self.cfg.model.model_type == "heatmap_mhcrnn"

    # -- stacking / trimming -------------------------------------------------------

    def unpack_preds(
        self, preds: list[tuple[np.ndarray, np.ndarray]]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Stack per-batch (keypoints, confidences) and trim video padding
        (reference predictions.py:95-142)."""
        keypoints = np.vstack([np.asarray(kp) for kp, _ in preds])
        confs = np.vstack([np.asarray(c) for _, c in preds])
        if self.video_file is None:
            return keypoints, confs

        # the last video window is FILL-padded past the end of the file
        keypoints = keypoints[: self.frame_count]
        confs = confs[: self.frame_count]
        if self.do_context:
            keypoints = self.fix_context_preds_confs(keypoints)
            # mhcrnn emits real confidences at the edges; plain context
            # models get theirs zeroed (reference predictions.py:130-138)
            confs = self.fix_context_preds_confs(
                confs,
                zero_pad_confidence=self.cfg.model.model_type != "heatmap_mhcrnn",
            )
        return keypoints, confs

    def fix_context_preds_confs(
        self, rows: np.ndarray, zero_pad_confidence: bool = False
    ) -> np.ndarray:
        """Shift context-model outputs by 2 frames and patch the edges
        (reference predictions.py:144-175).

        Context windows associate output 0 with frame 2, so output row i
        belongs to frame i+2: gather each frame's row from two back, clamping
        the first two frames to row 0.
        """
        n_frames = self.frame_count
        shifted = rows[np.maximum(np.arange(len(rows)) - 2, 0)]
        if len(shifted) == n_frames:
            # no outputs exist for the last two frames; reuse the last valid row
            shifted[-2:] = shifted[-3]
        else:
            # too few outputs for the video: the reference pads the tail by
            # repeating row 0 (its quirk, predictions.py:164-169 — preserved)
            shifted = np.concatenate(
                [shifted, np.broadcast_to(shifted[0], (n_frames - len(shifted), rows.shape[1]))]
            )
        if zero_pad_confidence:
            shifted[:2] = 0.0
            shifted[-2:] = 0.0
        return shifted

    # -- dataframe assembly ---------------------------------------------------------

    @staticmethod
    def make_pred_arr_undo_resize(
        keypoints_np: np.ndarray, confidence_np: np.ndarray
    ) -> np.ndarray:
        """Interleave per-keypoint (x, y, likelihood) column triplets
        (reference predictions.py:177-204)."""
        n_frames, n_keypoints = confidence_np.shape
        assert keypoints_np.shape == (n_frames, n_keypoints * 2)
        triplets = np.concatenate(
            [
                keypoints_np.reshape(n_frames, n_keypoints, 2),
                confidence_np[:, :, None],
            ],
            axis=-1,
        )
        # float64 to match the reference's output dtype (CSV formatting)
        return triplets.reshape(n_frames, n_keypoints * 3).astype(np.float64)

    def make_dlc_pandas_index(self, keypoint_names: list | None = None) -> pd.MultiIndex:
        return make_dlc_pandas_index(
            cfg=self.cfg, keypoint_names=keypoint_names or self.keypoint_names
        )

    def add_split_indices_to_df(self, df: pd.DataFrame) -> pd.DataFrame:
        """Add the train/validation/test ``set`` column
        (reference predictions.py:220-236)."""
        membership = np.full(len(df), "unused", dtype=object)
        for split_name in ("train", "validation", "test"):
            subset = getattr(
                self.data_module, f"{split_name.replace('validation', 'val')}_dataset"
            )
            membership[np.asarray(subset.indices, dtype=int)] = split_name
        df["set"] = membership
        return df

    def _assemble_df(
        self, keypoints: np.ndarray, confs: np.ndarray, image_names=None
    ) -> pd.DataFrame:
        """One view's dataframe: interleaved columns, DLC index, and (for
        labeled datasets) the split column + image-name index."""
        df = pd.DataFrame(
            self.make_pred_arr_undo_resize(keypoints, confs),
            columns=self.make_dlc_pandas_index(),
        )
        if self.video_file is None:
            df = self.add_split_indices_to_df(df)
            df.index = image_names
        return df

    def __call__(
        self, preds: list[tuple[np.ndarray, np.ndarray]], is_multiview_video: bool = False
    ) -> pd.DataFrame | dict[str, pd.DataFrame]:
        """Build the prediction dataframe(s) (reference predictions.py:262-327)."""
        keypoints, confs = self.unpack_preds(preds)
        view_names = self.cfg.data.get("view_names", None)
        multiview = (
            view_names
            and len(view_names) > 1
            and (self.video_file is None or is_multiview_video)
        )
        if not multiview:
            names = (
                self.data_module.dataset.image_names
                if self.video_file is None
                else None
            )
            return self._assemble_df(keypoints, confs, names)

        # fused multiview outputs carry views side by side: K keypoints
        # (2K coordinate columns) per view, in view_names order
        n_kp = len(self.keypoint_names)
        view_to_df = {}
        for i, view_name in enumerate(view_names):
            names = (
                self.data_module.dataset.image_names_by_view[view_name]
                if self.video_file is None
                else None
            )
            view_to_df[view_name] = self._assemble_df(
                keypoints[:, 2 * n_kp * i : 2 * n_kp * (i + 1)],
                confs[:, n_kp * i : n_kp * (i + 1)],
                names,
            )
        return view_to_df
