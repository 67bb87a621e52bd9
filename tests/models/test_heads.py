"""Heatmap-head unit tests (reference tests/models/heads/test_heatmap.py).

Covers the structural rules the reference asserts: the
``n_layers = log2(stride) - downsample_factor - 1`` deconv count (via output
spatial dims), torch-compatible PixelShuffle channel order, spatial-softmax
normalization, and soft-argmax decode accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightning_pose_tpu.models.heads.heatmap import HeatmapHead, pixel_shuffle


def test_pixel_shuffle_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 4, 16)).astype(np.float32)  # NHWC
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    theirs = (
        torch.nn.PixelShuffle(2)(torch.from_numpy(x).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


@pytest.mark.parametrize(
    "arch,df,in_hw,expected_hw",
    [
        # resnet stride 32: feature h/32 -> heatmap h/2^df
        ("resnet50", 2, 8, 64),   # 256px input: 8 -> 64 = 256/4
        ("resnet50", 3, 8, 32),   # 256px input: 8 -> 32 = 256/8
        # ViT stride 16: feature h/16 -> same h/2^df target
        ("vitb_imagenet", 2, 16, 64),
    ],
)
def test_head_output_dims_follow_deconv_rule(arch, df, in_hw, expected_hw):
    head = HeatmapHead(backbone_arch=arch, out_channels=5, downsample_factor=df)
    feats = jnp.zeros((1, in_hw, in_hw, 64), dtype=jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(variables, feats)
    assert out.shape == (1, expected_hw, expected_hw, 5)


def test_head_heatmaps_are_normalized():
    head = HeatmapHead(backbone_arch="resnet50", out_channels=3)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32))
    variables = head.init(jax.random.PRNGKey(0), feats)
    out = np.asarray(head.apply(variables, feats))
    assert (out >= 0).all()
    np.testing.assert_allclose(out.sum(axis=(1, 2)), 1.0, atol=1e-5)


def test_head_init_near_uniform():
    """Xavier gain 0.01 + zero bias -> near-uniform initial heatmaps
    (reference heatmap.py:74-83 initialization intent)."""
    head = HeatmapHead(backbone_arch="resnet50", out_channels=2)
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 32))
    variables = head.init(jax.random.PRNGKey(0), feats)
    out = np.asarray(head.apply(variables, feats))
    uniform = 1.0 / (out.shape[1] * out.shape[2])
    assert np.abs(out - uniform).max() < uniform * 0.5


@pytest.mark.parametrize("df", [2, 3])
def test_run_subpixelmaxima_decodes_peak(df):
    """A synthetic Gaussian at heatmap location p decodes to image coords
    ~ p * 2^df (reference heatmap.py:103-144 decode contract)."""
    from lightning_pose_tpu.data.heatmaps import generate_heatmaps

    size = 256
    hm_size = size // (2**df)
    kp_img = np.array([[[100.0, 60.0], [200.0, 180.0]]], dtype=np.float32)
    hms = generate_heatmaps(kp_img, size, size, (hm_size, hm_size))

    head = HeatmapHead(
        backbone_arch="resnet50", out_channels=2, downsample_factor=df
    )
    preds, confs = head.run_subpixelmaxima(hms)
    preds = np.asarray(preds).reshape(1, 2, 2)
    confs = np.asarray(confs)
    np.testing.assert_allclose(preds, kp_img, atol=1.0)
    assert confs.shape == (1, 2)
    assert (confs > 0.5).all() and (confs <= 1.0 + 1e-6).all()


# -- MHCRNN head units (reference tests/models/heads/test_heatmap_mhcrnn.py) --


def test_upsampling_crnn_output_normalized():
    """CRNN output is spatial-softmaxed: per-keypoint maps sum to 1
    (reference test_heatmap_mhcrnn.py:209)."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.models.heads.heatmap_mhcrnn import UpsamplingCRNN

    crnn = UpsamplingCRNN(num_filters_for_upsampling=64, num_keypoints=3)
    feats = jax.random.normal(jax.random.PRNGKey(0), (5, 2, 8, 8, 64))
    variables = crnn.init(jax.random.PRNGKey(1), feats)
    out = crnn.apply(variables, feats)
    assert out.shape[0] == 2 and out.shape[-1] == 3
    sums = np.asarray(out).sum(axis=(1, 2))
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)


@pytest.mark.parametrize("upsampling_factor,expected_hw", [(2, 64), (1, 32)])
def test_upsampling_crnn_output_dims(upsampling_factor, expected_hw):
    """upsampling_factor 2 adds one extra 2x deconv stage before the RNN
    (reference test_heatmap_mhcrnn.py:165-207): 8 -> 2x pixel-shuffle ->
    [2x W_pre] -> 2x W_f/W_b = 32 or 64."""
    import jax

    from lightning_pose_tpu.models.heads.heatmap_mhcrnn import UpsamplingCRNN

    crnn = UpsamplingCRNN(
        num_filters_for_upsampling=64,
        num_keypoints=4,
        upsampling_factor=upsampling_factor,
    )
    feats = jax.random.normal(jax.random.PRNGKey(0), (5, 1, 8, 8, 64))
    variables = crnn.init(jax.random.PRNGKey(1), feats)
    out = crnn.apply(variables, feats)
    assert out.shape == (1, expected_hw, expected_hw, 4)
    if upsampling_factor == 1:
        assert "W_pre" not in variables["params"]
    else:
        assert "W_pre" in variables["params"]


def test_mhcrnn_head_sf_uses_middle_frame():
    """The single-frame head sees exactly the middle context frame: output
    is invariant to changing the edge frames (reference
    heatmap_mhcrnn.py:154 takes frames[:, 2])."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.models.heads.heatmap_mhcrnn import HeatmapMHCRNNHead

    head = HeatmapMHCRNNHead(
        backbone_arch="resnet18", in_channels=64, out_channels=3
    )
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8, 8, 64))
    variables = head.init(jax.random.PRNGKey(1), feats)
    sf0, mf0 = head.apply(variables, feats)
    perturbed = feats.at[:, 0].add(1.0).at[:, 4].add(-1.0)
    sf1, mf1 = head.apply(variables, perturbed)
    np.testing.assert_allclose(np.asarray(sf0), np.asarray(sf1), atol=1e-6)
    assert not np.allclose(np.asarray(mf0), np.asarray(mf1), atol=1e-4)


def test_mhcrnn_crnn_is_bidirectional():
    """Perturbing only the first frame changes the output (backward pass
    reaches it), as does perturbing only the last (forward pass)."""
    import jax

    from lightning_pose_tpu.models.heads.heatmap_mhcrnn import UpsamplingCRNN

    crnn = UpsamplingCRNN(num_filters_for_upsampling=64, num_keypoints=2)
    feats = jax.random.normal(jax.random.PRNGKey(0), (5, 1, 8, 8, 64))
    variables = crnn.init(jax.random.PRNGKey(1), feats)
    base = np.asarray(crnn.apply(variables, feats))
    first = np.asarray(crnn.apply(variables, feats.at[0].add(2.0)))
    last = np.asarray(crnn.apply(variables, feats.at[4].add(2.0)))
    assert not np.allclose(base, first, atol=1e-5)
    assert not np.allclose(base, last, atol=1e-5)
