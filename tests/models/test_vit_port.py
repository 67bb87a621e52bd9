"""Numerical parity: Flax ViT with ported weights vs HF torch ViTModel."""

import numpy as np
import pytest


@pytest.mark.slow
def test_vit_port_matches_hf_forward(rng):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.models.backbones.torch_port import port_vit_state_dict
    from lightning_pose_tpu.models.backbones.vit import ViT

    config = transformers.ViTConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=256,
        image_size=32,
        patch_size=16,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-6,  # match flax LayerNorm default
    )
    hf = transformers.ViTModel(config, add_pooling_layer=False).eval()

    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(x)).last_hidden_state.numpy()  # (B, 1+N, D)
    ref_grid = ref[:, 1:, :].reshape(2, 2, 2, 64)

    model = ViT(
        embed_dim=64, depth=2, num_heads=4, patch_size=16, pretrained_grid=2,
        dtype=jnp.float32,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    ported = port_vit_state_dict(hf.state_dict(), depth=2, num_heads=4)

    import flax.serialization

    params = flax.serialization.from_state_dict(variables["params"], ported)
    out = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )
    np.testing.assert_allclose(np.asarray(out), ref_grid, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_vitb_imagenet_mae_checkpoint_ports_through_dispatcher(tmp_path, rng):
    """A lightning MAE-format checkpoint ({'state_dict': {'vit_mae.vit.*'}},
    the format the reference's vitb_imagenet option consumes, reference
    models/backbones/vit.py:52-84) ports through port_backbone_checkpoint
    at full ViT-B scale and reproduces the HF torch forward."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    import jax
    import jax.numpy as jnp

    import flax.serialization
    from lightning_pose_tpu.models.backbones import torch_port as tp
    from lightning_pose_tpu.models.backbones.vit import VIT_CONFIGS, ViT

    embed_dim, depth, num_heads, patch = VIT_CONFIGS["vitb"]
    size = 224  # the MAE pretraining resolution: no pos-embed resize here
    config = transformers.ViTConfig(
        hidden_size=embed_dim,
        num_hidden_layers=depth,
        num_attention_heads=num_heads,
        intermediate_size=embed_dim * 4,
        image_size=size,
        patch_size=patch,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-6,
    )
    hf = transformers.ViTModel(config, add_pooling_layer=False).eval()

    sd = {f"vit_mae.vit.{k}": v for k, v in hf.state_dict().items()}
    sd["decoder.junk"] = torch.zeros(3)  # MAE decoder keys are ignored
    path = tmp_path / "mae_vitb.ckpt"
    torch.save({"state_dict": sd, "epoch": 99}, path)

    ported = tp.port_backbone_checkpoint("vitb_imagenet", str(path), image_size=size)

    x = rng.normal(size=(1, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(x)).last_hidden_state.numpy()
    grid = size // patch
    ref_grid = ref[:, 1:, :].reshape(1, grid, grid, embed_dim)

    model = ViT(
        embed_dim=embed_dim, depth=depth, num_heads=num_heads,
        patch_size=patch, pretrained_grid=grid, dtype=jnp.float32,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
    )
    params = flax.serialization.from_state_dict(
        variables["params"], ported["params"]
    )
    out = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False
    )
    np.testing.assert_allclose(np.asarray(out), ref_grid, atol=5e-4, rtol=1e-3)
