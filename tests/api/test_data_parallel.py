"""Data-parallel (multi-chip) inference tests.

TPU-native beyond-parity feature: ``Model.from_dir(..., data_parallel=True)``
shards prediction batches over the device mesh (8 virtual CPU devices here).
The reference pins prediction to one GPU (reference utils/predictions.py:462
``pl.Trainer(devices=1)``), so the contract under test is OURS: sharded
predictions must match single-device predictions bit-for-bit-ish.
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest


def _make_model_dir(tmp: Path, cfg, model_type="heatmap", backbone="resnet18"):
    """config.yaml + tb_logs ckpt layout the way train() writes it."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.models.factory import get_model
    from lightning_pose_tpu.train import checkpoints as ckpt_utils

    c = cfg.copy()
    c.model.model_type = model_type
    c.model.backbone = backbone
    c.model.model_name = "dptest"

    module, _meta = get_model(c)
    h = int(c.data.image_resize_dims.height)
    w = int(c.data.image_resize_dims.width)
    if model_type == "heatmap_mhcrnn":
        dummy = jnp.zeros((1, 5, h, w, 3), dtype=jnp.float32)
    else:
        dummy = jnp.zeros((1, h, w, 3), dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), dummy, train=False)

    model_dir = tmp / f"model_{model_type}"
    version_dir = Path(
        ckpt_utils.next_version_dir(str(model_dir), c.model.model_name)
    )
    ckpt_dir = ckpt_utils.checkpoint_dir(str(version_dir))
    ckpt_utils.save_checkpoint(
        str(Path(ckpt_dir) / "epoch=1-step=10-best.ckpt"),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        step=10,
        epoch=1,
    )
    ckpt_utils.wait_for_saves()
    c.save(str(model_dir / "config.yaml"))
    return model_dir


@pytest.fixture(scope="module")
def short_video(tmp_path_factory) -> str:
    """A 24-frame synthetic video (moving bright square on noise)."""
    import cv2

    path = tmp_path_factory.mktemp("dpvid") / "dp_vid.mp4"
    rng = np.random.default_rng(7)
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (160, 120)
    )
    for t in range(24):
        frame = rng.integers(0, 80, size=(120, 160, 3), dtype=np.uint8)
        x = 10 + 5 * t
        frame[40:70, x % 120 : x % 120 + 30] = 230
        writer.write(frame)
    writer.release()
    return str(path)


def _video_csv(model, video, out_dir):
    model.predict_on_video_file(
        video, compute_metrics=False, output_dir=str(out_dir)
    )
    return pd.read_csv(
        Path(out_dir) / (Path(video).stem + ".csv"), header=[0, 1, 2], index_col=0
    )


def test_video_predict_parity(cfg, tmp_path_factory, short_video):
    """Sharded video inference == single-device inference (heatmap)."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from lightning_pose_tpu.api.model import Model

    c = cfg.copy()
    c.dali.base.predict.sequence_length = 16
    model_dir = _make_model_dir(tmp_path_factory.mktemp("dp"), c)

    serial = _video_csv(
        Model.from_dir(model_dir), short_video, tmp_path_factory.mktemp("s")
    )
    sharded_model = Model.from_dir(model_dir, data_parallel=True)
    sharded = _video_csv(
        sharded_model, short_video, tmp_path_factory.mktemp("p")
    )
    # the wrapper must actually be installed on the multi-device mesh
    assert sharded_model._predict_fn.__name__ == "dp_predict"
    assert len(serial) == len(sharded) == 24
    np.testing.assert_allclose(
        serial.to_numpy(), sharded.to_numpy(), rtol=1e-4, atol=1e-3
    )


def test_video_predict_parity_context_model(cfg, tmp_path_factory, short_video):
    """MHCRNN context windows cross shard boundaries — GSPMD must halo-
    exchange frames so sharded == serial."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from lightning_pose_tpu.api.model import Model

    c = cfg.copy()
    c.dali.context.predict.sequence_length = 16
    model_dir = _make_model_dir(
        tmp_path_factory.mktemp("dpc"), c, model_type="heatmap_mhcrnn"
    )

    serial = _video_csv(
        Model.from_dir(model_dir), short_video, tmp_path_factory.mktemp("s")
    )
    sharded = _video_csv(
        Model.from_dir(model_dir, data_parallel=True),
        short_video,
        tmp_path_factory.mktemp("p"),
    )
    assert len(serial) == len(sharded) == 24
    np.testing.assert_allclose(
        serial.to_numpy(), sharded.to_numpy(), rtol=1e-4, atol=1e-3
    )


def test_predict_frame_pads_to_mesh(cfg, tmp_path_factory):
    """A single-frame batch (size 1) is padded to the mesh size and the
    pad rows trimmed — output matches the single-device path."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from lightning_pose_tpu.api.model import Model

    model_dir = _make_model_dir(tmp_path_factory.mktemp("dpf"), cfg)
    frame = np.random.default_rng(3).integers(
        0, 255, size=(120, 160, 3), dtype=np.uint8
    )
    out_serial = Model.from_dir(model_dir).predict_frame(frame)
    out_sharded = Model.from_dir(model_dir, data_parallel=True).predict_frame(
        frame
    )
    np.testing.assert_allclose(
        out_serial["keypoints"], out_sharded["keypoints"], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        out_serial["confidence"], out_sharded["confidence"], rtol=1e-4,
        atol=1e-4,
    )


def test_export_works_with_data_parallel(cfg, tmp_path_factory):
    """export() must trace the device-side program, not the host-side
    dp wrapper (which np.asarray's its inputs), and must not bake the
    mesh-replicated state's sharding into the artifact."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from lightning_pose_tpu.api.model import Model

    c = cfg.copy()
    c.dali.base.predict.sequence_length = 8
    model_dir = _make_model_dir(tmp_path_factory.mktemp("dpe"), c)
    m = Model.from_dir(model_dir, data_parallel=True)
    path = m.export(output_dir=tmp_path_factory.mktemp("exp"))
    fn = Model.load_exported(path)
    images = np.random.default_rng(0).integers(
        0, 255, size=(8, 128, 128, 3), dtype=np.uint8
    )
    bbox = np.tile(np.array([0, 0, 128, 128], np.float32), (8, 1))
    kp, conf = fn(images, bbox)
    kp_dp, conf_dp = m._predict_fn(m._state, images, bbox)
    np.testing.assert_allclose(
        np.asarray(kp), np.asarray(kp_dp), rtol=1e-4, atol=1e-3
    )


def test_label_csv_parity(cfg, toy_data_dir, tmp_path_factory):
    """Sharded labeled-CSV inference matches serial (padded static batches
    whose size may not divide the mesh)."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    from lightning_pose_tpu.api.model import Model

    model_dir = _make_model_dir(tmp_path_factory.mktemp("dpl"), cfg)
    kwargs = dict(compute_metrics=False)
    serial = Model.from_dir(model_dir).predict_on_label_csv(
        "CollectedData.csv", data_dir=toy_data_dir,
        output_dir=tmp_path_factory.mktemp("s"), **kwargs
    )
    sharded = Model.from_dir(model_dir, data_parallel=True).predict_on_label_csv(
        "CollectedData.csv", data_dir=toy_data_dir,
        output_dir=tmp_path_factory.mktemp("p"), **kwargs
    )
    a = serial.predictions.drop(columns="set", level=0, errors="ignore")
    b = sharded.predictions.drop(columns="set", level=0, errors="ignore")
    np.testing.assert_allclose(
        a.to_numpy(dtype=float), b.to_numpy(dtype=float), rtol=1e-4, atol=1e-3
    )
