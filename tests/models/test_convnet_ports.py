"""Numerical parity tests for EfficientNet and MMPose-format ResNet ports.

torchvision is not installed in this environment, so the tests hand-build
torch trunks with torchvision's exact module naming and numerics (the
checkpoint formats the reference downloads, reference
backbones/factory.py:238-334) and assert the Flax forward matches.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp
import flax.serialization

from lightning_pose_tpu.models.backbones import torch_port as tp


# ---------------------------------------------------------------- efficientnet


class _ConvBNAct(nn.Sequential):
    """torchvision Conv2dNormActivation: indices 0=conv, 1=bn, 2=act."""

    def __init__(self, cin, cout, kernel, stride=1, groups=1, act=True):
        layers = [
            nn.Conv2d(
                cin, cout, kernel, stride, (kernel - 1) // 2, groups=groups,
                bias=False,
            ),
            nn.BatchNorm2d(cout),
        ]
        if act:
            layers.append(nn.SiLU(inplace=True))
        super().__init__(*layers)


class _SqueezeExcitation(nn.Module):
    """torchvision SqueezeExcitation: fc1 (reduce), fc2 (expand)."""

    def __init__(self, c, squeeze):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(c, squeeze, 1)
        self.fc2 = nn.Conv2d(squeeze, c, 1)

    def forward(self, x):
        s = self.fc2(nn.functional.silu(self.fc1(self.avgpool(x))))
        return x * torch.sigmoid(s)


class _MBConv(nn.Module):
    def __init__(self, cin, cout, expand, kernel, stride):
        super().__init__()
        mid = cin * expand
        layers = []
        if expand != 1:
            layers.append(_ConvBNAct(cin, mid, 1))
        layers.append(_ConvBNAct(mid, mid, kernel, stride, groups=mid))
        layers.append(_SqueezeExcitation(mid, max(1, cin // 4)))
        layers.append(_ConvBNAct(mid, cout, 1, act=False))
        self.block = nn.Sequential(*layers)
        self.use_res = stride == 1 and cin == cout

    def forward(self, x):
        out = self.block(x)
        return out + x if self.use_res else out


_EFF_STAGES = [  # (expand, channels, repeats, stride, kernel) — b0 base
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


def _tv_round_channels(c: float, divisor: int = 8) -> int:
    """torchvision _make_divisible."""
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


class _TorchEfficientNetTrunk(nn.Module):
    """torchvision-named efficientnet trunk (features.0 .. features.8) with
    compound width/depth scaling — the exact torchvision b0/b1/b2 recipe
    (reference backbones/factory.py:302-316 loads these weights)."""

    def __init__(self, width_mult=1.0, depth_mult=1.0, head_channels=1280):
        super().__init__()
        import math

        stem = _tv_round_channels(32 * width_mult)
        feats = [_ConvBNAct(3, stem, 3, 2)]
        cin = stem
        for expand, cout0, repeats0, stride, kernel in _EFF_STAGES:
            cout = _tv_round_channels(cout0 * width_mult)
            repeats = int(math.ceil(repeats0 * depth_mult))
            blocks = []
            for i in range(repeats):
                blocks.append(
                    _MBConv(cin, cout, expand, kernel, stride if i == 0 else 1)
                )
                cin = cout
            feats.append(nn.Sequential(*blocks))
        feats.append(_ConvBNAct(cin, head_channels, 1))
        self.features = nn.Sequential(*feats)

    def forward(self, x):
        return self.features(x)


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["b0", "b1", "b2"])
def test_efficientnet_port_matches_torch(rng, variant):
    """Every efficientnet registry variant that claims a torchvision port
    reproduces the torch forward (b1 scales depth, b2 scales width+depth —
    distinct stage shapes from b0)."""
    from lightning_pose_tpu.models.backbones.efficientnet import (
        EFFICIENTNET_CONFIGS,
        EfficientNet,
    )

    width_mult, depth_mult, head_channels = EFFICIENTNET_CONFIGS[variant]
    torch.manual_seed(0)
    trunk = _TorchEfficientNetTrunk(width_mult, depth_mult, head_channels).eval()
    with torch.no_grad():
        for m in trunk.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = trunk(torch.tensor(x)).numpy().transpose(0, 2, 3, 1)

    params, batch_stats = tp.port_efficientnet_state_dict(
        trunk.state_dict(), variant
    )
    model = EfficientNet(variant=variant, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    # the port must cover every parameter the Flax model defines
    flat_model = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(variables["params"])
    )
    flat_port = flax.traverse_util.flatten_dict(params)
    assert set(flat_model.keys()) == set(flat_port.keys())
    params = flax.serialization.from_state_dict(variables["params"], params)
    batch_stats = flax.serialization.from_state_dict(
        variables["batch_stats"], batch_stats
    )
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    assert out.shape == (1, 2, 2, head_channels)  # stride 32
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-2)


# ------------------------------------------------------------ mmpose resnet50


class _TorchBottleneck(nn.Module):
    def __init__(self, cin, width, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return torch.relu(out + identity)


class _TorchResNet50Trunk(nn.Module):
    """torchvision-named resnet50 trunk (through layer4)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        blocks_per = [3, 4, 6, 3]
        cin = 64
        for stage in range(4):
            width = widths[stage]
            cout = width * 4
            blocks = [
                _TorchBottleneck(cin, width, cout, 1 if stage == 0 else 2)
            ]
            for _ in range(blocks_per[stage] - 1):
                blocks.append(_TorchBottleneck(cout, width, cout))
            setattr(self, f"layer{stage + 1}", nn.Sequential(*blocks))
            cin = cout

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for stage in range(4):
            x = getattr(self, f"layer{stage + 1}")(x)
        return x


@pytest.mark.slow
def test_mmpose_resnet50_checkpoint_ports_through_dispatcher(tmp_path, rng):
    """An MMPose-style checkpoint ({'state_dict': {'backbone.*': ...}} with
    extra head keys, reference factory.py:253-283) ports through
    port_backbone_checkpoint for the resnet50_animal_* names and reproduces
    the torch forward."""
    from lightning_pose_tpu.models.backbones.resnet import ResNet

    torch.manual_seed(0)
    trunk = _TorchResNet50Trunk().eval()
    with torch.no_grad():
        for m in trunk.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    sd = {f"backbone.{k}": v for k, v in trunk.state_dict().items()}
    sd["keypoint_head.final_layer.weight"] = torch.zeros(17, 2048, 1, 1)
    path = tmp_path / "res50_ap10k.pth"
    torch.save({"state_dict": sd, "meta": {"mmpose_version": "0.x"}}, path)

    ported = tp.port_backbone_checkpoint("resnet50_animal_ap10k", str(path))

    x = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = trunk(torch.tensor(x)).numpy().transpose(0, 2, 3, 1)

    model = ResNet(arch="resnet50", dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    params = flax.serialization.from_state_dict(
        variables["params"], ported["params"]
    )
    batch_stats = flax.serialization.from_state_dict(
        variables["batch_stats"], ported["batch_stats"]
    )
    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-2)
