"""Port torchvision/MMPose ResNet checkpoints into Flax parameter trees.

The reference loads ImageNet weights from torchvision and animal/human pose
weights from MMPose URLs (reference
lightning_pose/models/backbones/factory.py:238-334). This environment has no
network egress, so porting is driven by local checkpoint files: given a
torch ``state_dict`` (torchvision naming, optionally prefixed ``backbone.``
as in MMPose checkpoints, reference factory.py:260-265), produce
``(params, batch_stats)`` pytrees matching
:class:`lightning_pose_tpu.models.backbones.resnet.ResNet`.

Layout conversion: torch conv kernels are OIHW; Flax expects HWIO.
"""

from __future__ import annotations

import logging
from typing import Any, Mapping

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["port_resnet_state_dict", "port_vit_state_dict", "load_torch_checkpoint"]


def _to_numpy(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_kernel(t: Any) -> np.ndarray:
    """OIHW -> HWIO."""
    return _to_numpy(t).transpose(2, 3, 1, 0)


def load_torch_checkpoint(path: str) -> dict[str, Any]:
    """Load a torch checkpoint file and return its (flattened) state dict.

    Handles both raw state dicts and {'state_dict': ...} containers, and
    strips MMPose's ``backbone.`` prefix (reference factory.py:260-265).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    out = {}
    for key, value in state_dict.items():
        if key.startswith("backbone."):
            key = key[len("backbone."):]
        out[key] = value
    return out


def port_resnet_state_dict(
    state_dict: Mapping[str, Any],
    stage_sizes: tuple[int, ...],
    bottleneck: bool,
) -> tuple[dict, dict]:
    """Convert a torchvision-style ResNet state dict to Flax trees.

    Returns:
        (params, batch_stats) nested dicts matching ``ResNet``'s variable
        structure. Missing keys are skipped with a warning (mirrors the
        reference's ``strict=False`` load, factory.py:265).
    """
    params: dict[str, Any] = {}
    batch_stats: dict[str, Any] = {}

    def put_conv(flax_name: str, torch_name: str) -> None:
        key = f"{torch_name}.weight"
        if key in state_dict:
            params[flax_name] = {"kernel": _conv_kernel(state_dict[key])}
        else:
            logger.warning(f"missing conv weight: {key}")

    def put_bn(flax_name: str, torch_name: str) -> None:
        try:
            params[flax_name] = {
                "scale": _to_numpy(state_dict[f"{torch_name}.weight"]),
                "bias": _to_numpy(state_dict[f"{torch_name}.bias"]),
            }
            batch_stats[flax_name] = {
                "mean": _to_numpy(state_dict[f"{torch_name}.running_mean"]),
                "var": _to_numpy(state_dict[f"{torch_name}.running_var"]),
            }
        except KeyError as e:
            logger.warning(f"missing bn params for {torch_name}: {e}")

    put_conv("conv1", "conv1")
    put_bn("bn1", "bn1")

    convs_per_block = 3 if bottleneck else 2
    for stage, num_blocks in enumerate(stage_sizes):
        for block in range(num_blocks):
            prefix = f"layer{stage + 1}.{block}"
            flax_block: dict[str, Any] = {}
            flax_stats: dict[str, Any] = {}
            for c in range(1, convs_per_block + 1):
                ck = f"{prefix}.conv{c}.weight"
                if ck in state_dict:
                    flax_block[f"conv{c}"] = {"kernel": _conv_kernel(state_dict[ck])}
                bn = f"{prefix}.bn{c}"
                if f"{bn}.weight" in state_dict:
                    flax_block[f"bn{c}"] = {
                        "scale": _to_numpy(state_dict[f"{bn}.weight"]),
                        "bias": _to_numpy(state_dict[f"{bn}.bias"]),
                    }
                    flax_stats[f"bn{c}"] = {
                        "mean": _to_numpy(state_dict[f"{bn}.running_mean"]),
                        "var": _to_numpy(state_dict[f"{bn}.running_var"]),
                    }
            ds = f"{prefix}.downsample"
            if f"{ds}.0.weight" in state_dict:
                flax_block["downsample_conv"] = {
                    "kernel": _conv_kernel(state_dict[f"{ds}.0.weight"])
                }
                flax_block["downsample_bn"] = {
                    "scale": _to_numpy(state_dict[f"{ds}.1.weight"]),
                    "bias": _to_numpy(state_dict[f"{ds}.1.bias"]),
                }
                flax_stats["downsample_bn"] = {
                    "mean": _to_numpy(state_dict[f"{ds}.1.running_mean"]),
                    "var": _to_numpy(state_dict[f"{ds}.1.running_var"]),
                }
            name = f"layer{stage + 1}_{block}"
            params[name] = flax_block
            batch_stats[name] = flax_stats

    return params, batch_stats


def port_vit_state_dict(
    state_dict: Mapping[str, Any],
    depth: int,
    num_heads: int,
) -> dict:
    """Convert an HF ``ViTModel``-style state dict (facebook/dino-*,
    vit-mae-*; reference backbones/vit.py:52-81) to the Flax ``ViT`` tree.

    HF layout: ``embeddings.{cls_token,position_embeddings,
    patch_embeddings.projection.*}``, ``encoder.layer.N.{attention.attention.
    {query,key,value},attention.output.dense,intermediate.dense,output.dense,
    layernorm_before,layernorm_after}``, final ``layernorm``.
    """
    params: dict[str, Any] = {}

    def arr(key: str) -> np.ndarray:
        return _to_numpy(state_dict[key])

    params["cls_token"] = arr("embeddings.cls_token")
    params["pos_embed"] = arr("embeddings.position_embeddings")
    params["patch_embed"] = {
        "kernel": _conv_kernel(state_dict["embeddings.patch_embeddings.projection.weight"]),
        "bias": arr("embeddings.patch_embeddings.projection.bias"),
    }

    embed_dim = params["cls_token"].shape[-1]
    head_dim = embed_dim // num_heads

    def dense(prefix: str) -> dict:
        return {
            "kernel": _to_numpy(state_dict[f"{prefix}.weight"]).T,
            "bias": arr(f"{prefix}.bias"),
        }

    def qkv(prefix: str) -> dict:
        # torch Linear (out, in) -> flax attention head split
        w = _to_numpy(state_dict[f"{prefix}.weight"]).T  # (in, out)
        b = arr(f"{prefix}.bias")
        return {
            "kernel": w.reshape(embed_dim, num_heads, head_dim),
            "bias": b.reshape(num_heads, head_dim),
        }

    for i in range(depth):
        hf = f"encoder.layer.{i}"
        out_w = _to_numpy(state_dict[f"{hf}.attention.output.dense.weight"]).T
        params[f"block{i}"] = {
            "ln1": {
                "scale": arr(f"{hf}.layernorm_before.weight"),
                "bias": arr(f"{hf}.layernorm_before.bias"),
            },
            "attn": {
                "query": qkv(f"{hf}.attention.attention.query"),
                "key": qkv(f"{hf}.attention.attention.key"),
                "value": qkv(f"{hf}.attention.attention.value"),
                "out": {
                    "kernel": out_w.reshape(num_heads, head_dim, embed_dim),
                    "bias": arr(f"{hf}.attention.output.dense.bias"),
                },
            },
            "ln2": {
                "scale": arr(f"{hf}.layernorm_after.weight"),
                "bias": arr(f"{hf}.layernorm_after.bias"),
            },
            "mlp": {
                "fc1": dense(f"{hf}.intermediate.dense"),
                "fc2": dense(f"{hf}.output.dense"),
            },
        }

    params["ln"] = {
        "scale": arr("layernorm.weight"),
        "bias": arr("layernorm.bias"),
    }
    return params
