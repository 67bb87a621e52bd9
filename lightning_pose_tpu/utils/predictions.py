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
        stacked_preds = np.vstack([np.asarray(p[0]) for p in preds])
        stacked_confs = np.vstack([np.asarray(p[1]) for p in preds])
        if self.video_file is not None:
            num_rows_to_discard = stacked_preds.shape[0] - self.frame_count
            if num_rows_to_discard > 0:
                stacked_preds = stacked_preds[:-num_rows_to_discard]
                stacked_confs = stacked_confs[:-num_rows_to_discard]
            if self.do_context:
                stacked_preds = self.fix_context_preds_confs(stacked_preds)
                if self.cfg.model.model_type == "heatmap_mhcrnn":
                    stacked_confs = self.fix_context_preds_confs(
                        stacked_confs, zero_pad_confidence=False
                    )
                else:
                    stacked_confs = self.fix_context_preds_confs(
                        stacked_confs, zero_pad_confidence=True
                    )
        return stacked_preds, stacked_confs

    def fix_context_preds_confs(
        self, stacked_preds: np.ndarray, zero_pad_confidence: bool = False
    ) -> np.ndarray:
        """Shift context-model outputs by 2 frames and patch the edges
        (reference predictions.py:144-175)."""
        preds_1 = np.tile(stacked_preds[0], (2, 1))
        preds_2 = stacked_preds[0:-2]
        preds_combined = np.vstack([preds_1, preds_2])
        if preds_combined.shape[0] == self.frame_count:
            preds_combined[-2:, :] = preds_combined[-3, :]
        else:
            n_pad = self.frame_count - preds_combined.shape[0]
            preds_combined = np.vstack(
                [preds_combined, np.tile(preds_combined[0], (n_pad, 1))]
            )
        if zero_pad_confidence:
            preds_combined[:2, :] = 0.0
            preds_combined[-2:, :] = 0.0
        return preds_combined

    # -- dataframe assembly ---------------------------------------------------------

    @staticmethod
    def make_pred_arr_undo_resize(
        keypoints_np: np.ndarray, confidence_np: np.ndarray
    ) -> np.ndarray:
        """Interleave (x, y, likelihood) columns (reference
        predictions.py:177-204)."""
        assert keypoints_np.shape[0] == confidence_np.shape[0]
        assert keypoints_np.shape[1] == confidence_np.shape[1] * 2
        num_joints = confidence_np.shape[-1]
        predictions = np.zeros((keypoints_np.shape[0], num_joints * 3))
        predictions[:, 0] = np.arange(keypoints_np.shape[0])
        predictions[:, 0::3] = keypoints_np[:, 0::2]
        predictions[:, 1::3] = keypoints_np[:, 1::2]
        predictions[:, 2::3] = confidence_np
        return predictions

    def make_dlc_pandas_index(self, keypoint_names: list | None = None) -> pd.MultiIndex:
        return make_dlc_pandas_index(
            cfg=self.cfg, keypoint_names=keypoint_names or self.keypoint_names
        )

    def add_split_indices_to_df(self, df: pd.DataFrame) -> pd.DataFrame:
        """Add the train/validation/test ``set`` column
        (reference predictions.py:220-236)."""
        df["set"] = np.array(["unused"] * df.shape[0])
        dataset_split_indices = {
            "train": self.data_module.train_dataset.indices,
            "validation": self.data_module.val_dataset.indices,
            "test": self.data_module.test_dataset.indices,
        }
        for key, val in dataset_split_indices.items():
            df.loc[val, ("set", "", "")] = np.repeat(key, len(val))
        return df

    def __call__(
        self, preds: list[tuple[np.ndarray, np.ndarray]], is_multiview_video: bool = False
    ) -> pd.DataFrame | dict[str, pd.DataFrame]:
        """Build the prediction dataframe(s) (reference predictions.py:262-327)."""
        stacked_preds, stacked_confs = self.unpack_preds(preds)
        view_names = self.cfg.data.get("view_names", None)
        if (
            view_names
            and len(view_names) > 1
            and (self.video_file is None or is_multiview_video)
        ):
            num_keypoints = len(self.keypoint_names)
            view_to_df = {}
            for view_idx, view_name in enumerate(view_names):
                idx_beg = view_idx * num_keypoints
                idx_end = idx_beg + num_keypoints
                pred_arr = self.make_pred_arr_undo_resize(
                    stacked_preds[:, idx_beg * 2:idx_end * 2],
                    stacked_confs[:, idx_beg:idx_end],
                )
                pdindex = self.make_dlc_pandas_index(self.keypoint_names)
                df = pd.DataFrame(pred_arr, columns=pdindex)
                view_to_df[view_name] = df
                if self.video_file is None:
                    df = self.add_split_indices_to_df(df)
                    view_dataset = self.data_module.dataset
                    df.index = view_dataset.image_names_by_view[view_name]
            return view_to_df

        pred_arr = self.make_pred_arr_undo_resize(stacked_preds, stacked_confs)
        pdindex = self.make_dlc_pandas_index()
        df = pd.DataFrame(pred_arr, columns=pdindex)
        if self.video_file is None:
            df = self.add_split_indices_to_df(df)
            df.index = self.data_module.dataset.image_names
        return df
