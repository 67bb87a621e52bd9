"""PredictionResult / MultiviewPredictionResult contract tests
(reference tests/data/test_datatypes.py:1-208)."""

import numpy as np
import pandas as pd

from lightning_pose_tpu.data.datatypes import (
    MultiviewPredictionResult,
    PredictionResult,
)
from lightning_pose_tpu.metrics import ComputeMetricsSingleResult


def _preds_df(n_frames=3, keypoints=("nose", "tail")):
    cols = pd.MultiIndex.from_tuples(
        [("tracker", kp, c) for kp in keypoints for c in ("x", "y", "likelihood")],
        names=["scorer", "bodyparts", "coords"],
    )
    rng = np.random.default_rng(0)
    data = rng.uniform(0, 100, size=(n_frames, len(cols)))
    idx = [f"labeled-data/s/img{i}.png" for i in range(n_frames)]
    return pd.DataFrame(data, index=pd.Index(idx), columns=cols)


def test_prediction_result_to_dict_keys_and_shapes():
    df = _preds_df()
    result = PredictionResult(predictions=df)
    d = result.to_dict()
    assert d["keypoint_names"] == ["nose", "tail"]
    assert len(d["index"]) == 3
    assert d["x"].shape == (3, 2)
    assert d["y"].shape == (3, 2)
    assert d["confidence"].shape == (3, 2)
    # metric entries None when metrics were not computed
    for key in (
        "pixel_error", "temporal_norm",
        "pca_singleview_error", "pca_multiview_error",
    ):
        assert d[key] is None
    # values round-trip from the dataframe
    np.testing.assert_allclose(
        d["x"][:, 0], df[("tracker", "nose", "x")].to_numpy()
    )
    np.testing.assert_allclose(
        d["confidence"][:, 1], df[("tracker", "tail", "likelihood")].to_numpy()
    )


def test_prediction_result_to_dict_with_metrics_drops_set_column():
    df = _preds_df()
    pix = pd.DataFrame(
        {"nose": [1.0, 2.0, 3.0], "tail": [4.0, 5.0, 6.0],
         "set": ["train", "train", "validation"]},
        index=df.index,
    )
    result = PredictionResult(
        predictions=df, metrics=ComputeMetricsSingleResult(pixel_error_df=pix)
    )
    d = result.to_dict()
    assert d["pixel_error"].shape == (3, 2)  # 'set' column excluded
    np.testing.assert_allclose(d["pixel_error"][:, 0], [1.0, 2.0, 3.0])
    assert d["temporal_norm"] is None


def test_multiview_prediction_result_to_dict():
    dfs = {"top": _preds_df(), "bot": _preds_df()}
    metrics = {
        "top": ComputeMetricsSingleResult(
            temporal_norm_df=pd.DataFrame(
                {"nose": [0.1, 0.2, 0.3], "tail": [0.4, 0.5, 0.6]}
            )
        )
    }
    result = MultiviewPredictionResult(predictions=dfs, metrics=metrics)
    d = result.to_dict()
    assert set(d.keys()) == {"top", "bot"}
    assert d["top"]["temporal_norm"].shape == (3, 2)
    assert d["bot"]["temporal_norm"] is None  # no metrics for this view
    assert d["bot"]["x"].shape == (3, 2)
