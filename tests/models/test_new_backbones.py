"""Numerical parity tests for the DINOv2/DINOv3/SAM/SAM2-Hiera backbones.

Each test builds the corresponding HuggingFace reference model from a small
config (random init — no network egress needed), ports the torch state dict
with torch_port, and asserts the Flax forward matches torch to float32
tolerance. Mirrors how the reference loads these trunks via HF wrappers
(reference lightning_pose/models/backbones/vit_dino.py, vit_sam.py,
vit_sam2.py).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from lightning_pose_tpu.models.backbones import torch_port as tp

TOL = dict(atol=2e-5, rtol=1e-4)


def _nhwc(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(x).permute(0, 3, 1, 2)


def test_dinov2_port_matches_hf(rng):
    from transformers import Dinov2Config, Dinov2Model

    from lightning_pose_tpu.models.backbones.vit_dino import DinoV2ViT

    torch.manual_seed(0)
    hf = Dinov2Model(
        Dinov2Config(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            patch_size=16, image_size=64,
        )
    ).eval()
    params = tp.port_dinov2_state_dict(hf.state_dict(), depth=2, patch_size=16)
    fx = DinoV2ViT(embed_dim=64, depth=2, num_heads=4, pretrained_grid=4)

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(_nhwc(x)).last_hidden_state[:, 1:].numpy().reshape(2, 4, 4, 64)
    out = np.asarray(fx.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, **TOL)

    # pos-embed interpolation path (input grid 6 != pretrained grid 4)
    x2 = rng.standard_normal((1, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref2 = hf(_nhwc(x2)).last_hidden_state[:, 1:].numpy().reshape(1, 6, 6, 64)
    out2 = np.asarray(fx.apply({"params": params}, jnp.asarray(x2)))
    np.testing.assert_allclose(out2, ref2, **TOL)


def test_dinov2_patch14_kernel_resize():
    """The patch-14 -> 16 port resizes the projection kernel like the
    reference (vit_dino.py:121-146)."""
    from transformers import Dinov2Config, Dinov2Model

    torch.manual_seed(0)
    hf = Dinov2Model(
        Dinov2Config(
            hidden_size=64, num_hidden_layers=1, num_attention_heads=4,
            patch_size=14, image_size=56,
        )
    )
    params = tp.port_dinov2_state_dict(hf.state_dict(), depth=1, patch_size=16)
    assert params["patch_embed"]["kernel"].shape == (16, 16, 3, 64)


def test_dinov3_port_matches_hf(rng):
    from transformers import DINOv3ViTConfig, DINOv3ViTModel

    from lightning_pose_tpu.models.backbones.vit_dino import DinoV3ViT

    torch.manual_seed(0)
    hf = DINOv3ViTModel(
        DINOv3ViTConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            num_register_tokens=2, intermediate_size=256, patch_size=16,
        )
    ).eval()
    params = tp.port_dinov3_state_dict(hf.state_dict(), depth=2)
    fx = DinoV3ViT(embed_dim=64, depth=2, num_heads=4, num_register_tokens=2)

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(_nhwc(x)).last_hidden_state[:, 3:].numpy().reshape(2, 4, 4, 64)
    out = np.asarray(fx.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, **TOL)


def test_sam_port_matches_hf(rng):
    """SAM ViT parity: windowed attention with padding (grid 6, window 4),
    global layer, rel-pos disabled like the reference (vit_sam.py:71-75)."""
    from transformers import SamVisionConfig
    from transformers.models.sam.modeling_sam import SamVisionEncoder

    from lightning_pose_tpu.models.backbones.vit_sam import SamViT

    torch.manual_seed(0)
    cfg = SamVisionConfig(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        image_size=96, window_size=4, global_attn_indexes=[1], mlp_dim=256,
        patch_size=16,
    )
    hf = SamVisionEncoder(cfg).eval()
    for layer in hf.layers:
        layer.attn.use_rel_pos = False

    x = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        hs = hf.patch_embed(_nhwc(x)) + hf.pos_embed
        for layer in hf.layers:  # bypass the neck, like the reference forward
            hs = layer(hs)
        ref = hs.numpy()

    params = tp.port_sam_state_dict(hf.state_dict(), depth=3, finetune_grid=6)
    fx = SamViT(
        embed_dim=64, depth=3, num_heads=4, window_size=4,
        global_attn_indexes=(1,), pos_grid=6,
    )
    out = np.asarray(fx.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, **TOL)


def test_sam_pos_embed_port_resizes():
    """Port-time antialiased downscale of the native 64x64 pos table
    (reference vit_sam.py:142-176)."""
    sd = {
        "pos_embed": torch.randn(1, 64, 64, 8),
        "patch_embed.projection.weight": torch.randn(8, 3, 16, 16),
        "patch_embed.projection.bias": torch.randn(8),
    }
    params = tp.port_sam_state_dict(sd, depth=0, finetune_grid=16)
    assert params["pos_embed"].shape == (1, 16, 16, 8)


def test_hiera_port_matches_hf(rng):
    from transformers import Sam2HieraDetConfig
    from transformers.models.sam2.modeling_sam2 import Sam2HieraDetModel

    from lightning_pose_tpu.models.backbones.hiera import Hiera

    torch.manual_seed(0)
    hf = Sam2HieraDetModel(
        Sam2HieraDetConfig(
            hidden_size=8, embed_dim_per_stage=[8, 16, 32, 64],
            num_attention_heads_per_stage=[1, 2, 4, 8],
            blocks_per_stage=[1, 1, 2, 1], global_attention_blocks=[3],
            window_size_per_stage=[8, 4, 14, 7],
        )
    ).eval()
    with torch.no_grad():
        hf.pos_embed.normal_()
        hf.pos_embed_window.normal_()

    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(_nhwc(x)).last_hidden_state.numpy()

    params = tp.port_hiera_state_dict(hf.state_dict(), num_blocks=5)
    fx = Hiera(
        embed_dim=8, num_heads=1, blocks_per_stage=(1, 1, 2, 1),
        global_attention_blocks=(3,), window_size_per_stage=(8, 4, 14, 7),
        bkg_size=7,
    )
    out = np.asarray(fx.apply({"params": params}, jnp.asarray(x)))
    assert out.shape == ref.shape == (2, 2, 2, 64)  # stride 32
    np.testing.assert_allclose(out, ref, **TOL)


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["vitt_sam2", "vits_sam2", "vitb_sam2"])
def test_port_backbone_checkpoint_strips_sam2_container_prefix(
    tmp_path, rng, arch
):
    """A full Sam2Model-style checkpoint (vision_encoder.backbone.*) ports
    through the single dispatcher into the real Hiera at each registry
    config's true size. vits has different depth/global-attn indices than
    vitt; vitb_sam2 additionally has distinct embed_dim (112), head count,
    and bkg_size (14) (reference backbones/factory.py:80-86,238-334)."""
    import jax

    from transformers import Sam2HieraDetConfig
    from transformers.models.sam2.modeling_sam2 import Sam2HieraDetModel

    import flax.serialization
    from lightning_pose_tpu.models.backbones.hiera import HIERA_CONFIGS, Hiera

    torch.manual_seed(0)
    c = HIERA_CONFIGS[arch]
    hf = Sam2HieraDetModel(
        Sam2HieraDetConfig(
            hidden_size=c["embed_dim"],
            embed_dim_per_stage=[c["embed_dim"] * 2 ** s for s in range(4)],
            num_attention_heads_per_stage=[c["num_heads"] * 2 ** s for s in range(4)],
            blocks_per_stage=list(c["blocks_per_stage"]),
            global_attention_blocks=list(c["global_attention_blocks"]),
            window_size_per_stage=[8, 4, 14, 7],
            window_positional_embedding_background_size=[c["bkg_size"]] * 2,
        )
    ).eval()
    with torch.no_grad():
        hf.pos_embed.normal_()
        hf.pos_embed_window.normal_()

    sd = {f"vision_encoder.backbone.{k}": v for k, v in hf.state_dict().items()}
    sd["vision_encoder.neck.junk"] = torch.zeros(1)
    path = tmp_path / f"sam2_{arch}.pt"
    torch.save(sd, path)

    ported = tp.port_backbone_checkpoint(arch, str(path), image_size=128)

    x = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(_nhwc(x)).last_hidden_state.numpy()

    fx = Hiera(**HIERA_CONFIGS[arch])
    variables = fx.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    params = flax.serialization.from_state_dict(
        variables["params"], ported["params"]
    )
    out = np.asarray(fx.apply({"params": params}, jnp.asarray(x)))
    assert out.shape == (1, 4, 4, c["embed_dim"] * 8)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("arch", ["vitb_sam2", "vits_sam2", "vitt_sam2"])
def test_sam2_stride_is_32(arch):
    from lightning_pose_tpu.models.backbones.factory import BACKBONE_STRIDES

    assert BACKBONE_STRIDES[arch] == 32


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["vitt_sam2", "vits_dinov2", "vits_dinov3"])
def test_new_backbones_train_one_step(arch, rng):
    """Each new trunk initializes inside the HeatmapTracker and takes one
    gradient step (stride-32 head for sam2: 2 deconv layers)."""
    import jax
    import optax

    from lightning_pose_tpu.models.heatmap_tracker import HeatmapTracker

    size = 128
    model = HeatmapTracker(
        backbone_arch=arch, num_keypoints=3, image_size=size, dtype=jnp.float32
    )
    x = jnp.asarray(rng.standard_normal((2, size, size, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    hm = model.apply(variables, x, train=False)
    expected = size // 4  # 2^downsample_factor
    assert hm.shape == (2, expected, expected, 3)

    target = jnp.zeros_like(hm)

    def loss_fn(params):
        out = model.apply({"params": params, **{
            k: v for k, v in variables.items() if k != "params"
        }}, x, train=False)
        return jnp.mean((out - target) ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    tx = optax.adam(1e-3)
    state = tx.init(variables["params"])
    updates, _ = tx.update(grads, state, variables["params"])
    leaves = jax.tree_util.tree_leaves(updates)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in leaves)
