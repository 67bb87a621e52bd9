"""Video inference: decode -> batched jitted forward -> DLC CSV
(reference lightning_pose/utils/predictions.py:412-533 ``predict_video``).

This is the benchmark path: host decode threads overlap with the TPU
forward pass; the decode produces fixed-shape uint8 batches so one compiled
program serves the whole video.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path

import numpy as np

from lightning_pose_tpu.data.video import PredictVideoLoader
from lightning_pose_tpu.utils.predictions import PredictionHandler

logger = logging.getLogger(__name__)

__all__ = ["predict_video", "predict_video_multiview", "generate_labeled_video"]


def _device_prefetch(loader, depth: int = 2):
    """Double-buffered host->device transfer: a background thread
    ``jax.device_put``s batch t+1 while the main thread dispatches compute
    on batch t.

    Without this the jitted call transfers its numpy argument synchronously
    on the dispatching thread, serializing transfer and the per-dispatch
    RPC on remote-attached accelerators (each carries ~30-50 ms through
    the tunnel this was measured on). ``depth`` bounds in-flight batches so
    decode can't run ahead of HBM. On CPU backends the transfer is a no-op
    copy and the thread costs nothing measurable.
    """
    import queue
    import threading

    import jax

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    errors: list[BaseException] = []
    stop = threading.Event()

    def worker():
        try:
            for batch in loader:
                item = jax.device_put(batch)
                # bounded put so an abandoned consumer (predict_fn raised,
                # generator closed mid-iteration) can't strand this thread
                # on a full queue for the process lifetime
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surface decode/transfer errors
            errors.append(e)
        finally:
            while True:
                try:
                    q.put(None, timeout=0.5)
                    break
                except queue.Full:
                    if stop.is_set():
                        break

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is None:
                if errors:
                    raise errors[0]
                return
            yield item
    finally:
        stop.set()  # unblock + retire the worker if we exit early


def predict_video(
    video_file: str,
    cfg,
    predict_fn,
    state,
    model_dir: str,
    data_module=None,
    preds_file: str | None = None,
    generate_labeled_video: bool = False,
    compute_metrics: bool = True,
    bbox_df=None,
    progress_file=None,
    transfer_format: str = "rgb",
    prefetch: bool = True,
):
    """Run inference on one video; write ``video_preds/<stem>.csv`` (+
    optional labeled mp4 + metric side CSVs). Returns a
    :class:`~lightning_pose_tpu.data.datatypes.PredictionResult`
    (reference api/model.py:1139 returns the same).

    ``transfer_format``: 'rgb' or 'yuv420' — the host->device batch layout
    (the predict_fn must understand 3-dim I420 batches for 'yuv420').

    ``bbox_df``: optional per-frame [x, y, h, w] DataFrame for bbox-crop
    inference (the detector->pose cropzoom path, reference dali.py:332-396);
    predictions are remapped through the per-frame bboxes back to original
    coords.
    """
    do_context = cfg.model.model_type == "heatmap_mhcrnn"
    seq_key = "context" if do_context else "base"
    seq_len = int(cfg.dali[seq_key]["predict"]["sequence_length"])
    height = int(cfg.data.image_resize_dims.height)
    width = int(cfg.data.image_resize_dims.width)

    loader = PredictVideoLoader(
        video_file=video_file,
        sequence_length=seq_len,
        resize_height=height,
        resize_width=width,
        do_context=do_context,
        bbox_df=bbox_df,
        transfer_format=transfer_format,
    )

    # predictions are remapped to original video resolution via a full-frame
    # bbox (or the per-frame crop bboxes), matching the reference's DALI
    # batch bbox (reference dali.py _dali_output_to_tensors)
    import cv2

    cap = cv2.VideoCapture(str(video_file))
    orig_h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    orig_w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    cap.release()
    if bbox_df is not None:
        bbox_rows = bbox_df[["x", "y", "h", "w"]].to_numpy().astype(np.float32)
    else:
        bbox_rows = None
    full_bbox = np.tile(
        np.array([0.0, 0.0, orig_h, orig_w], dtype=np.float32), (seq_len, 1)
    )

    def batch_bbox(i: int) -> np.ndarray:
        if bbox_rows is None:
            return full_bbox
        start = i * loader.step
        idx = np.minimum(
            np.arange(start, start + seq_len), len(bbox_rows) - 1
        )
        return bbox_rows[idx]

    progress = None
    if progress_file is not None:
        from lightning_pose_tpu.callbacks import JSONInferenceProgressTracker

        progress = JSONInferenceProgressTracker(
            progress_file, total_batches=len(loader)
        )

    t0 = time.time()
    # dispatch all batches asynchronously (device work overlaps host
    # decode), then fetch results at the end — one pipeline, no per-batch
    # host sync. With prefetch, batch t+1's host->device transfer rides a
    # background thread while batch t dispatches (``prefetch=False`` for
    # data-parallel predict_fns that shard their own inputs).
    batches = _device_prefetch(loader) if prefetch else loader
    device_preds = []
    for i, batch in enumerate(batches):
        kp, conf = predict_fn(state, batch, batch_bbox(i))
        device_preds.append((kp, conf))
    # progress steps at materialization (np.asarray blocks until the device
    # result is real), so the app-facing file tracks actual completion, not
    # async dispatch
    preds = []
    for kp, conf in device_preds:
        preds.append((np.asarray(kp), np.asarray(conf)))
        if progress is not None:
            progress.step()
    elapsed = time.time() - t0
    fps = loader.frame_count / max(elapsed, 1e-9)
    logger.info(
        f"predicted {loader.frame_count} frames of {Path(video_file).name} in "
        f"{elapsed:.2f}s ({fps:.1f} frames/s)"
    )

    handler = PredictionHandler(cfg=cfg, data_module=data_module, video_file=video_file)
    df = handler(preds)

    if preds_file is None:
        preds_dir = Path(model_dir) / "video_preds"
        preds_dir.mkdir(parents=True, exist_ok=True)
        preds_file = str(preds_dir / (Path(video_file).stem + ".csv"))
    os.makedirs(os.path.dirname(preds_file), exist_ok=True)
    df.to_csv(preds_file)

    metrics_result = None
    if compute_metrics:
        try:
            from lightning_pose_tpu.metrics import compute_metrics_single

            metrics_result = compute_metrics_single(
                cfg=cfg, labels_file=None, preds_file=preds_file,
                data_module=data_module,
            )
        except Exception as e:
            logger.warning(f"video metrics computation failed: {e}")

    if generate_labeled_video:
        labeled_dir = Path(preds_file).parent / "labeled_videos"
        labeled_dir.mkdir(parents=True, exist_ok=True)
        output_mp4 = str(labeled_dir / (Path(video_file).stem + "_labeled.mp4"))
        try:
            _create_labeled_video(
                video_file=video_file,
                preds_df_file=preds_file,
                output_mp4=output_mp4,
                confidence_thresh=float(
                    cfg.eval.get("confidence_thresh_for_vid", 0.9)
                ),
                colormap=str(cfg.eval.get("colormap", "cool")),
            )
        except Exception as e:
            logger.warning(f"labeled video generation failed: {e}")

    from lightning_pose_tpu.data.datatypes import PredictionResult

    return PredictionResult(predictions=df, metrics=metrics_result)


def predict_video_multiview(
    video_file_per_view: list[str],
    view_names: list[str],
    cfg,
    predict_fn,
    state,
    model_dir: str,
    generate_labeled_video: bool = False,
    compute_metrics: bool = True,
    transfer_format: str = "rgb",
    output_dir: str | None = None,
    progress_file=None,
    prefetch: bool = True,
):
    """Frame-synchronized multiview video inference: one CSV per view
    (reference api/model.py:1225 ``predict_on_video_file_multiview``).
    Returns a
    :class:`~lightning_pose_tpu.data.datatypes.MultiviewPredictionResult`."""
    import cv2

    from lightning_pose_tpu.data.video import MultiviewPredictVideoLoader

    do_context = cfg.model.model_type == "heatmap_mhcrnn"
    seq_key = "context" if do_context else "base"
    seq_len = int(cfg.dali[seq_key]["predict"]["sequence_length"])
    height = int(cfg.data.image_resize_dims.height)
    width = int(cfg.data.image_resize_dims.width)

    loader = MultiviewPredictVideoLoader(
        [str(v) for v in video_file_per_view],
        sequence_length=seq_len,
        resize_height=height,
        resize_width=width,
        transfer_format=transfer_format,
        do_context=do_context,
    )
    # per-view full-frame bboxes, (T, V*4)
    bbox_cols = []
    for v in video_file_per_view:
        cap = cv2.VideoCapture(str(v))
        oh = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        ow = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        cap.release()
        bbox_cols.append(np.tile([0.0, 0.0, oh, ow], (seq_len, 1)))
    bbox = np.concatenate(bbox_cols, axis=1).astype(np.float32)

    progress = None
    if progress_file is not None:
        from lightning_pose_tpu.callbacks import JSONInferenceProgressTracker

        progress = JSONInferenceProgressTracker(
            progress_file, total_batches=len(loader)
        )

    t0 = time.time()
    preds = []
    for batch in (_device_prefetch(loader) if prefetch else loader):
        kp, conf = predict_fn(state, batch, bbox)
        preds.append((np.asarray(kp), np.asarray(conf)))
        if progress is not None:
            progress.step()
    elapsed = time.time() - t0
    logger.info(
        f"predicted {loader.frame_count} frames x {len(view_names)} views in "
        f"{elapsed:.2f}s ({loader.frame_count / max(elapsed, 1e-9):.1f} frames/s)"
    )

    handler = PredictionHandler(
        cfg=cfg, data_module=None, video_file=str(video_file_per_view[0])
    )
    view_to_df = handler(preds, is_multiview_video=True)

    preds_dir = (
        Path(output_dir) if output_dir else Path(model_dir) / "video_preds"
    )
    preds_dir.mkdir(parents=True, exist_ok=True)
    out = {}
    out_metrics: dict[str, object] = {}
    for view_name, video_file in zip(view_names, video_file_per_view):
        df = view_to_df[view_name]
        preds_file = preds_dir / (Path(video_file).stem + ".csv")
        df.to_csv(preds_file)
        out[view_name] = df
        if compute_metrics:
            try:
                from lightning_pose_tpu.metrics import compute_metrics_single

                out_metrics[view_name] = compute_metrics_single(
                    cfg=cfg, labels_file=None, preds_file=str(preds_file)
                )
            except Exception as e:
                logger.warning(f"video metrics failed ({view_name}): {e}")
        if generate_labeled_video:
            labeled_dir = preds_dir / "labeled_videos"
            labeled_dir.mkdir(parents=True, exist_ok=True)
            try:
                _create_labeled_video(
                    video_file=str(video_file),
                    preds_df_file=str(preds_file),
                    output_mp4=str(
                        labeled_dir / (Path(video_file).stem + "_labeled.mp4")
                    ),
                    confidence_thresh=float(
                        cfg.eval.get("confidence_thresh_for_vid", 0.9)
                    ),
                    colormap=str(cfg.eval.get("colormap", "cool")),
                )
            except Exception as e:
                logger.warning(f"labeled video failed ({view_name}): {e}")
    from lightning_pose_tpu.data.datatypes import MultiviewPredictionResult

    return MultiviewPredictionResult(
        predictions=out, metrics=out_metrics or None
    )


def generate_labeled_video(
    video_file: str,
    preds_df_file: str,
    output_mp4: str,
    confidence_thresh: float = 0.9,
    colormap: str = "cool",
    dotsize: int = 4,
) -> None:
    """Public labeled-video overlay entry point
    (reference predictions.py:714)."""
    _create_labeled_video(
        video_file=video_file,
        preds_df_file=preds_df_file,
        output_mp4=output_mp4,
        confidence_thresh=confidence_thresh,
        colormap=colormap,
        dotsize=dotsize,
    )


def _make_cmap(n: int, cmap: str) -> np.ndarray:
    """n evenly spaced RGB colors from a matplotlib colormap
    (reference predictions.py:560-574)."""
    import matplotlib.pyplot as plt

    color_class = plt.cm.ScalarMappable(cmap=cmap)
    C = color_class.to_rgba(np.linspace(0, 1, n))
    return (C[:, :3] * 255).astype(np.uint8)


def _create_labeled_video(
    video_file: str,
    preds_df_file: str,
    output_mp4: str,
    confidence_thresh: float = 0.9,
    colormap: str = "cool",
    dotsize: int = 4,
    resize_dims: tuple[int, int] | None = None,
) -> None:
    """Overlay predicted keypoints on the video (cv2-based; the reference
    uses moviepy + cv2, reference predictions.py:576-713)."""
    import cv2
    import pandas as pd

    df = pd.read_csv(preds_df_file, header=[0, 1, 2], index_col=0)
    xyl_mask = df.columns.get_level_values("coords").isin(["x", "y", "likelihood"])
    arr = df.loc[:, xyl_mask].to_numpy().reshape(df.shape[0], -1, 3)
    n_keypoints = arr.shape[1]
    colors = _make_cmap(n_keypoints, colormap)

    cap = cv2.VideoCapture(str(video_file))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    orig_w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    orig_h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(
        output_mp4, cv2.VideoWriter_fourcc(*"mp4v"), fps, (orig_w, orig_h)
    )
    # predictions are in model-resize coords; scale back to original res
    if resize_dims is not None:
        sx = orig_w / resize_dims[0]
        sy = orig_h / resize_dims[1]
    else:
        sx = sy = 1.0
    frame_idx = 0
    while frame_idx < arr.shape[0]:
        ret, frame = cap.read()
        if not ret:
            break
        for k in range(n_keypoints):
            x, y, likelihood = arr[frame_idx, k]
            if np.isnan(x) or likelihood < confidence_thresh:
                continue
            color = tuple(int(c) for c in colors[k][::-1])  # BGR
            cv2.circle(frame, (int(x * sx), int(y * sy)), dotsize, color, -1)
        writer.write(frame)
        frame_idx += 1
    cap.release()
    writer.release()
