"""DARK decode accuracy and wiring (arXiv:1910.06278 Taylor-expansion
sub-pixel decoding, the opt-in cfg.eval.decode_method=dark)."""

import numpy as np
import pytest

from lightning_pose_tpu.data.heatmaps import generate_heatmaps
from lightning_pose_tpu.ops.dark import run_dark_decode
from lightning_pose_tpu.ops.softargmax import run_subpixelmaxima


def _decode_errors(df=2, size=256, n=32, seed=0):
    rng = np.random.default_rng(seed)
    hm_size = size // (2**df)
    kp = rng.uniform(20, size - 20, size=(n, 3, 2)).astype(np.float32)
    hms = generate_heatmaps(kp, size, size, (hm_size, hm_size))

    dark_preds, dark_conf = run_dark_decode(hms, downsample_factor=df)
    soft_preds, _ = run_subpixelmaxima(hms, downsample_factor=df)
    dark_err = np.abs(np.asarray(dark_preds).reshape(n, 3, 2) - kp)
    soft_err = np.abs(np.asarray(soft_preds).reshape(n, 3, 2) - kp)
    return dark_err, soft_err, np.asarray(dark_conf)


def test_dark_decode_subpixel_accuracy():
    """On clean training-width gaussians at random sub-pixel positions,
    DARK recovers locations to well under half an image pixel and at
    least matches the soft-argmax pipeline."""
    dark_err, soft_err, conf = _decode_errors()
    assert dark_err.mean() < 0.3
    assert dark_err.max() < 1.5
    assert dark_err.mean() <= soft_err.mean() + 0.05
    # peaked maps give high confidence
    assert (conf > 0.5).all()


@pytest.mark.parametrize("df", [1, 2, 3])
def test_dark_decode_downsample_factors(df):
    dark_err, _, _ = _decode_errors(df=df)
    # error scales with heatmap stride but stays sub-pixel at the heatmap
    assert dark_err.mean() < 0.35 * (2 ** (df - 2)) + 0.3


def test_dark_decode_flat_map_is_finite():
    """Degenerate flat heatmaps must not produce NaN/inf coordinates."""
    hms = np.full((1, 32, 32, 2), 1.0 / (32 * 32), dtype=np.float32)
    preds, conf = run_dark_decode(hms, downsample_factor=2)
    assert np.isfinite(np.asarray(preds)).all()
    assert np.isfinite(np.asarray(conf)).all()


def test_dark_decode_edge_peak():
    """Peaks at the map border decode without indexing errors."""
    hms = np.zeros((1, 32, 32, 1), dtype=np.float32)
    hms[0, 0, 0, 0] = 1.0
    preds, _ = run_dark_decode(hms, downsample_factor=2)
    p = np.asarray(preds).reshape(2)
    assert np.isfinite(p).all()
    assert p[0] < 12 and p[1] < 12  # near the corner in image coords


def test_dark_decode_border_peak_unbiased():
    """A peak ON the heatmap border decodes to the argmax coordinate with
    zero Taylor offset (the reference DARK/mmpose behavior) — not shifted
    inward by the clamped stencil (a 2^df-px image-space bias)."""
    hms = np.zeros((1, 32, 32, 2), dtype=np.float32)
    # channel 0: peak at row 0 (top border), interior column
    hms[0, 0, 10, 0] = 1.0
    hms[0, 1, 10, 0] = 0.4
    # channel 1: interior peak for contrast
    hms[0, 16, 16, 1] = 1.0
    preds, _ = run_dark_decode(hms, downsample_factor=2)
    p = np.asarray(preds).reshape(2, 2)
    # border peak: y must be the true argmax row 0 (scaled), not row 1
    assert p[0, 1] == pytest.approx(0.0, abs=1e-5)
    assert abs(p[0, 0] - 10 * 4) < 4.0  # x near the argmax column
    # interior peak decodes near its location with sub-pixel offset allowed
    assert abs(p[1, 0] - 64) < 4.0 and abs(p[1, 1] - 64) < 4.0


def test_model_decode_method_config(cfg, tmp_path):
    """cfg.eval.decode_method=dark routes Model predictions through the
    DARK decoder."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.api.model import Model
    from lightning_pose_tpu.models.factory import get_model
    from lightning_pose_tpu.train import checkpoints as ckpt_utils

    c = cfg.copy()
    c.model.model_name = "dark-test"
    c.eval.decode_method = "dark"
    module, _ = get_model(c)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
    )
    model_dir = tmp_path / "m"
    vdir = ckpt_utils.next_version_dir(str(model_dir), "dark-test")
    cdir = ckpt_utils.checkpoint_dir(vdir)
    ckpt_utils.save_checkpoint(
        f"{cdir}/epoch=0-step=0-best.ckpt",
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        step=0, epoch=0,
    )
    ckpt_utils.wait_for_saves()
    c.save(str(model_dir / "config.yaml"))

    m = Model.from_dir(model_dir)
    out = m.predict_frame(np.zeros((256, 256, 3), dtype=np.uint8))
    assert out["keypoints"].shape == (17, 2)
    assert np.isfinite(out["keypoints"]).all()

    c2 = c.copy()
    c2.eval.decode_method = "not-a-decoder"
    c2.save(str(model_dir / "config.yaml"))
    m2 = Model.from_dir(model_dir)
    with pytest.raises(ValueError, match="decode_method"):
        m2.predict_frame(np.zeros((256, 256, 3), dtype=np.uint8))
