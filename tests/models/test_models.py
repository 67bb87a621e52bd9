"""Shape/behavior tests for the model stack (mirroring reference
tests/models/* smoke coverage, CPU tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_pose_tpu.models.heatmap_tracker import HeatmapTracker
from lightning_pose_tpu.models.regression_tracker import RegressionTracker


@pytest.fixture(scope="module")
def rng_key():
    return jax.random.PRNGKey(0)


def test_heatmap_tracker_shapes(rng_key):
    m = HeatmapTracker(
        backbone_arch="resnet18", num_keypoints=5, image_size=128, dtype=jnp.float32
    )
    x = jnp.zeros((2, 128, 128, 3))
    variables = m.init(rng_key, x, train=False)
    hm = m.apply(variables, x, train=False)
    assert hm.shape == (2, 32, 32, 5)
    # normalized heatmaps
    np.testing.assert_allclose(np.asarray(hm.sum(axis=(1, 2))), 1.0, atol=1e-4)
    kp, conf = m.apply(variables, hm, method=m.decode)
    assert kp.shape == (2, 10)
    assert conf.shape == (2, 5)
    # decoded coords within image bounds
    assert np.all(np.asarray(kp) > -3) and np.all(np.asarray(kp) < 131)


def test_heatmap_tracker_df3(rng_key):
    m = HeatmapTracker(
        backbone_arch="resnet18", num_keypoints=3, downsample_factor=3,
        image_size=128, dtype=jnp.float32,
    )
    x = jnp.zeros((1, 128, 128, 3))
    variables = m.init(rng_key, x, train=False)
    hm = m.apply(variables, x, train=False)
    assert hm.shape == (1, 16, 16, 3)


def test_heatmap_tracker_train_mode_updates_stats(rng_key):
    m = HeatmapTracker(
        backbone_arch="resnet18", num_keypoints=3, image_size=128, dtype=jnp.float32
    )
    x = jax.random.normal(rng_key, (2, 128, 128, 3))
    variables = m.init(rng_key, x, train=False)
    _, mutated = m.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["backbone"]["bn1"]["mean"]
    after = mutated["batch_stats"]["backbone"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_heatmap_tracker_multiview_folding(rng_key):
    """(B, V, H, W, 3) input folds views into the batch and unfolds to
    VIEW-MAJOR heatmap channels: channel v*K+k == view v's channel k
    (reference models/base.py:296-343 view stacking)."""
    import jax.numpy as jnp

    from lightning_pose_tpu.models.heatmap_tracker import HeatmapTracker

    model = HeatmapTracker(
        backbone_arch="resnet18", num_keypoints=3, image_size=64,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.normal(size=(2, 2, 64, 64, 3)).astype(np.float32)
    )
    variables = model.init(rng_key, frames[:, 0], train=False)
    hm_mv = model.apply(variables, frames, train=False)  # (2, h, w, 2*3)
    assert hm_mv.shape[-1] == 6
    for v in range(2):
        hm_single = model.apply(variables, frames[:, v], train=False)
        np.testing.assert_allclose(
            np.asarray(hm_mv[..., v * 3:(v + 1) * 3]),
            np.asarray(hm_single),
            rtol=1e-5, atol=1e-5,
        )


def test_regression_tracker(rng_key):
    m = RegressionTracker(
        backbone_arch="resnet18", num_keypoints=4, image_size=128, dtype=jnp.float32
    )
    x = jnp.zeros((2, 128, 128, 3))
    variables = m.init(rng_key, x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (2, 8)


def test_regression_rejects_vit():
    with pytest.raises(Exception):
        m = RegressionTracker(backbone_arch="vits_dino", num_keypoints=4)
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False)


def test_mhcrnn_tracker(rng_key):
    from lightning_pose_tpu.models.heatmap_tracker_mhcrnn import (
        HeatmapTrackerMHCRNN,
        make_context_windows,
        merge_heads_by_confidence,
    )

    m = HeatmapTrackerMHCRNN(
        backbone_arch="resnet18", num_keypoints=3, image_size=128, dtype=jnp.float32
    )
    x = jnp.zeros((2, 5, 128, 128, 3))
    variables = m.init(rng_key, x, train=False)
    hm_sf, hm_mf = m.apply(variables, x, train=False)
    assert hm_sf.shape == (2, 32, 32, 3)
    assert hm_mf.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(hm_mf.sum(axis=(1, 2))), 1.0, atol=1e-4)

    # window tiling: T frames -> T-4 windows
    seq = jnp.zeros((10, 16, 16, 3))
    win = make_context_windows(seq)
    assert win.shape == (6, 5, 16, 16, 3)

    # repeat_center: same window count/shape, every slot = the window's
    # center frame (train/inference consistency for
    # model.mhcrnn_context_mode=repeat_center)
    seq = jnp.arange(10, dtype=jnp.float32)[:, None, None, None] * jnp.ones(
        (10, 16, 16, 3)
    )
    win_r = make_context_windows(seq, repeat_center=True)
    assert win_r.shape == (6, 5, 16, 16, 3)
    for i in range(6):
        for t in range(5):
            np.testing.assert_array_equal(
                np.asarray(win_r[i, t]), np.asarray(seq[i + 2])
            )

    # sequences shorter than one window raise (not a silent empty output)
    for rc in (False, True):
        with pytest.raises(ValueError, match="at least 5 frames"):
            make_context_windows(jnp.zeros((4, 16, 16, 3)), repeat_center=rc)

    # confidence merge picks the higher-confidence head per keypoint
    kp_sf = jnp.asarray([[1.0, 1.0, 2.0, 2.0]])
    kp_mf = jnp.asarray([[5.0, 5.0, 6.0, 6.0]])
    conf_sf = jnp.asarray([[0.9, 0.1]])
    conf_mf = jnp.asarray([[0.5, 0.7]])
    kp, conf = merge_heads_by_confidence(kp_sf, conf_sf, kp_mf, conf_mf)
    np.testing.assert_allclose(np.asarray(kp), [[1.0, 1.0, 6.0, 6.0]])
    np.testing.assert_allclose(np.asarray(conf), [[0.9, 0.7]])


def test_mhcrnn_context_repeat_encodes_center_once(rng_key):
    """context_repeat=True (the tracker-side half of
    model.mhcrnn_context_mode=repeat_center) encodes the center frame once
    and tiles features — outputs must match the 5x-redundant dense path
    on repeated-center stacks (same params; ~1/5 the backbone FLOPs)."""
    from lightning_pose_tpu.models.heatmap_tracker_mhcrnn import (
        HeatmapTrackerMHCRNN,
        repeat_center_stack,
    )

    dense = HeatmapTrackerMHCRNN(
        backbone_arch="resnet18", num_keypoints=3, image_size=128,
        dtype=jnp.float32,
    )
    fast = HeatmapTrackerMHCRNN(
        backbone_arch="resnet18", num_keypoints=3, image_size=128,
        dtype=jnp.float32, context_repeat=True,
    )
    frames = jax.random.uniform(rng_key, (2, 1, 128, 128, 3))
    stacks = jnp.repeat(frames, 5, axis=1)  # repeated-center stacks
    variables = dense.init(rng_key, stacks, train=False)
    # identical parameter trees: a checkpoint loads into either mode
    hm_sf_d, hm_mf_d = dense.apply(variables, stacks, train=False)
    hm_sf_f, hm_mf_f = fast.apply(variables, stacks, train=False)
    np.testing.assert_allclose(
        np.asarray(hm_sf_d), np.asarray(hm_sf_f), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(hm_mf_d), np.asarray(hm_mf_f), atol=1e-5
    )

    # the helper normalizes arbitrary stacks to repeated centers
    mixed = jax.random.uniform(jax.random.PRNGKey(1), (2, 5, 8, 8, 3))
    norm = repeat_center_stack(mixed, time_axis=1)
    for t in range(5):
        np.testing.assert_array_equal(
            np.asarray(norm[:, t]), np.asarray(mixed[:, 2])
        )


def test_multiview_tracker(rng_key):
    from lightning_pose_tpu.models.heatmap_tracker_multiview import (
        HeatmapTrackerMultiviewTransformer,
    )

    m = HeatmapTrackerMultiviewTransformer(
        backbone_arch="vits_dino", num_keypoints=3, num_views=2,
        image_size=128, dtype=jnp.float32,
    )
    x = jnp.zeros((1, 2, 128, 128, 3))
    variables = m.init(rng_key, x, train=False)
    hm = m.apply(variables, x, train=False)
    assert hm.shape == (1, 32, 32, 6)  # V * K channels, view-major
    kp, conf = m.apply(variables, hm, method=m.decode)
    assert kp.shape == (1, 12)
    assert conf.shape == (1, 6)


def test_multiview_rejects_sam_backbones():
    from lightning_pose_tpu.models.heatmap_tracker_multiview import (
        HeatmapTrackerMultiviewTransformer,
    )

    with pytest.raises(Exception):
        m = HeatmapTrackerMultiviewTransformer(
            backbone_arch="vitb_sam", num_keypoints=3, num_views=2
        )
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 128, 128, 3)), train=False)


def test_vit_backbone_shapes(rng_key):
    from lightning_pose_tpu.models.backbones.vit import ViT

    m = ViT(embed_dim=384, depth=2, num_heads=6, patch_size=16,
            pretrained_grid=8, dtype=jnp.float32)
    x = jnp.zeros((2, 128, 128, 3))
    variables = m.init(rng_key, x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (2, 8, 8, 384)


def test_efficientnet_backbone(rng_key):
    from lightning_pose_tpu.models.backbones.efficientnet import EfficientNet

    m = EfficientNet(variant="b0", dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3))
    variables = m.init(rng_key, x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 4, 4, 1280)


def test_backbone_factory_registry():
    from lightning_pose_tpu.models.backbones.factory import (
        ALLOWED_BACKBONES,
        BACKBONE_STRIDES,
        build_backbone,
    )

    assert "resnet50_animal_ap10k" in ALLOWED_BACKBONES
    assert BACKBONE_STRIDES["resnet50"] == 32
    assert BACKBONE_STRIDES["vits_dino"] == 16
    module, feats, pretrained = build_backbone("resnet50")
    assert feats == 2048
    with pytest.raises(ValueError):
        build_backbone("not_a_backbone")


def test_model_factory(cfg):
    from lightning_pose_tpu.models.factory import (
        check_if_semi_supervised,
        get_model,
        get_model_class,
    )

    assert not check_if_semi_supervised(None)
    assert not check_if_semi_supervised([])
    assert not check_if_semi_supervised([""])
    assert check_if_semi_supervised(["temporal"])

    module, meta = get_model(cfg)
    assert meta["model_type"] == "heatmap"
    assert not meta["semi_supervised"]

    with pytest.raises(NotImplementedError):
        get_model_class("not_a_model")


def test_model_type_transformer_alias(cfg):
    """The reference's canonical 'heatmap_multiview_transformer' string
    resolves to the multiview tracker (reference models/factory.py:48-53)."""
    from lightning_pose_tpu.models.factory import (
        get_model,
        get_model_class,
        normalize_model_type,
    )
    from lightning_pose_tpu.models.heatmap_tracker_multiview import (
        HeatmapTrackerMultiviewTransformer,
    )

    assert normalize_model_type("heatmap_multiview_transformer") == "heatmap_multiview"
    assert normalize_model_type("heatmap") == "heatmap"
    cls = get_model_class("heatmap_multiview_transformer")
    assert cls is HeatmapTrackerMultiviewTransformer

    c = cfg.copy()
    c.model.model_type = "heatmap_multiview_transformer"
    c.data.view_names = ["top", "bot"]
    module, meta = get_model(c)
    assert meta["model_type"] == "heatmap_multiview"
    assert meta["num_views"] == 2
