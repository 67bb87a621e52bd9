"""Tests for torch -> Flax ResNet weight porting."""

import numpy as np
import pytest
import torch

from lightning_pose_tpu.models.backbones.torch_port import (
    load_torch_checkpoint,
    port_resnet_state_dict,
)


def _fake_torchvision_resnet18_state_dict():
    """Minimal torchvision-style resnet18 state dict with random values."""
    sd = {}
    sd["conv1.weight"] = torch.randn(64, 3, 7, 7)
    for bn, c in [("bn1", 64)]:
        sd[f"{bn}.weight"] = torch.randn(c)
        sd[f"{bn}.bias"] = torch.randn(c)
        sd[f"{bn}.running_mean"] = torch.randn(c)
        sd[f"{bn}.running_var"] = torch.rand(c) + 0.5
    widths = [64, 128, 256, 512]
    for stage, blocks in enumerate([2, 2, 2, 2]):
        w = widths[stage]
        in_w = widths[max(stage - 1, 0)] if stage > 0 else 64
        for b in range(blocks):
            p = f"layer{stage + 1}.{b}"
            cin = in_w if b == 0 else w
            sd[f"{p}.conv1.weight"] = torch.randn(w, cin, 3, 3)
            sd[f"{p}.conv2.weight"] = torch.randn(w, w, 3, 3)
            for bn in ["bn1", "bn2"]:
                sd[f"{p}.{bn}.weight"] = torch.randn(w)
                sd[f"{p}.{bn}.bias"] = torch.randn(w)
                sd[f"{p}.{bn}.running_mean"] = torch.randn(w)
                sd[f"{p}.{bn}.running_var"] = torch.rand(w) + 0.5
            if b == 0 and stage > 0:
                sd[f"{p}.downsample.0.weight"] = torch.randn(w, cin, 1, 1)
                sd[f"{p}.downsample.1.weight"] = torch.randn(w)
                sd[f"{p}.downsample.1.bias"] = torch.randn(w)
                sd[f"{p}.downsample.1.running_mean"] = torch.randn(w)
                sd[f"{p}.downsample.1.running_var"] = torch.rand(w) + 0.5
    return sd


def test_port_resnet18_into_flax_module():
    """Ported params must drop into the Flax ResNet and produce finite
    outputs that depend on the loaded weights."""
    import jax
    import jax.numpy as jnp

    from lightning_pose_tpu.models.backbones.resnet import ResNet

    sd = _fake_torchvision_resnet18_state_dict()
    params, batch_stats = port_resnet_state_dict(sd, (2, 2, 2, 2), bottleneck=False)

    model = ResNet(arch="resnet18", dtype=jnp.float32)
    x = jnp.ones((1, 64, 64, 3)) * 0.1
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # structures must match exactly (same keys, same shapes)
    ref_params = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
    ported_shapes = jax.tree_util.tree_map(lambda a: tuple(a.shape), params)
    assert ref_params == ported_shapes

    out_random = model.apply(variables, x, train=False)
    out_ported = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=False
    )
    assert np.isfinite(np.asarray(out_ported)).all()
    assert not np.allclose(np.asarray(out_random), np.asarray(out_ported))


def test_conv_kernel_layout_matches_torch():
    """OIHW -> HWIO transposition gives numerically identical convolution."""
    import jax
    import jax.numpy as jnp
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    w_torch = torch.tensor(rng.normal(size=(4, 3, 3, 3)).astype(np.float32))
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)

    out_torch = F.conv2d(
        torch.tensor(x.transpose(0, 3, 1, 2)), w_torch, padding=1
    ).numpy().transpose(0, 2, 3, 1)

    w_flax = w_torch.numpy().transpose(2, 3, 1, 0)  # HWIO
    out_jax = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w_flax), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out_jax), out_torch, atol=1e-4)


def test_load_torch_checkpoint_strips_backbone_prefix(tmp_path):
    sd = {"backbone.conv1.weight": torch.randn(2, 2), "other.key": torch.randn(1)}
    path = tmp_path / "ckpt.pth"
    torch.save({"state_dict": sd}, path)
    out = load_torch_checkpoint(str(path))
    assert "conv1.weight" in out
    assert "other.key" in out


class _TorchBasicBlock(torch.nn.Module):
    """Minimal torchvision-compatible BasicBlock for parity testing."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return torch.relu(out + identity)


class _TorchResNet18Trunk(torch.nn.Module):
    """torchvision-named resnet18 trunk (through layer4, no pool/fc)."""

    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        for stage in range(4):
            cin = widths[max(stage - 1, 0)] if stage > 0 else 64
            blocks = torch.nn.Sequential(
                _TorchBasicBlock(cin, widths[stage], 2 if stage > 0 else 1),
                _TorchBasicBlock(widths[stage], widths[stage]),
            )
            setattr(self, f"layer{stage + 1}", blocks)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for stage in range(4):
            x = getattr(self, f"layer{stage + 1}")(x)
        return x


@pytest.mark.slow
def test_resnet18_port_matches_torch_forward(rng):
    """Flax ResNet with ported weights reproduces the torch forward pass."""
    import jax
    import jax.numpy as jnp

    import flax.serialization
    from lightning_pose_tpu.models.backbones.resnet import ResNet

    torch.manual_seed(0)
    trunk = _TorchResNet18Trunk().eval()
    # randomize bn stats away from init for a meaningful check
    with torch.no_grad():
        for m in trunk.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = trunk(torch.tensor(x)).numpy().transpose(0, 2, 3, 1)

    params, batch_stats = port_resnet_state_dict(
        trunk.state_dict(), (2, 2, 2, 2), bottleneck=False
    )
    model = ResNet(arch="resnet18", dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    params = flax.serialization.from_state_dict(variables["params"], params)
    batch_stats = flax.serialization.from_state_dict(
        variables["batch_stats"], batch_stats
    )
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-2)
