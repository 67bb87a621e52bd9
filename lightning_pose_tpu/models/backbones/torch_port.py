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


def _dense(state_dict: Mapping[str, Any], prefix: str) -> dict:
    """torch Linear -> flax Dense (kernel transposed; bias optional)."""
    out = {"kernel": _to_numpy(state_dict[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in state_dict:
        out["bias"] = _to_numpy(state_dict[f"{prefix}.bias"])
    return out


def _ln(state_dict: Mapping[str, Any], prefix: str) -> dict:
    return {
        "scale": _to_numpy(state_dict[f"{prefix}.weight"]),
        "bias": _to_numpy(state_dict[f"{prefix}.bias"]),
    }


def _resize_patch_kernel(weight: Any, new_size: int) -> np.ndarray:
    """Bicubic-resize a torch OIHW patch-embed kernel to ``new_size`` —
    the reference's patch-14 -> 16 normalization (reference
    vit_dino.py:121-146: bicubic, align_corners=True, antialias=True).
    Returns HWIO for flax."""
    import torch
    import torch.nn.functional as F

    w = weight if hasattr(weight, "shape") else torch.as_tensor(weight)
    if not hasattr(w, "detach"):
        w = torch.as_tensor(np.asarray(w))
    o, i, kh, kw = w.shape
    if (kh, kw) != (new_size, new_size):
        w = w.reshape(o * i, 1, kh, kw)
        w = F.interpolate(
            w.float(), size=(new_size, new_size), mode="bicubic",
            align_corners=True, antialias=True,
        )
        w = w.reshape(o, i, new_size, new_size)
    return _conv_kernel(w)


def port_dinov2_state_dict(
    state_dict: Mapping[str, Any], depth: int, patch_size: int = 16
) -> dict:
    """Convert an HF ``Dinov2Model`` state dict (facebook/dinov2-*) to the
    Flax ``DinoV2ViT`` tree, resizing the patch-embed kernel to
    ``patch_size`` like the reference (vit_dino.py:121-146)."""
    params: dict[str, Any] = {
        "cls_token": _to_numpy(state_dict["embeddings.cls_token"]),
        "pos_embed": _to_numpy(state_dict["embeddings.position_embeddings"]),
        "patch_embed": {
            "kernel": _resize_patch_kernel(
                state_dict["embeddings.patch_embeddings.projection.weight"],
                patch_size,
            ),
            "bias": _to_numpy(
                state_dict["embeddings.patch_embeddings.projection.bias"]
            ),
        },
        "ln": _ln(state_dict, "layernorm"),
    }
    for i in range(depth):
        hf = f"encoder.layer.{i}"
        params[f"block{i}"] = {
            "ln1": _ln(state_dict, f"{hf}.norm1"),
            "query": _dense(state_dict, f"{hf}.attention.attention.query"),
            "key": _dense(state_dict, f"{hf}.attention.attention.key"),
            "value": _dense(state_dict, f"{hf}.attention.attention.value"),
            "out": _dense(state_dict, f"{hf}.attention.output.dense"),
            "ls1": {"lambda": _to_numpy(state_dict[f"{hf}.layer_scale1.lambda1"])},
            "ln2": _ln(state_dict, f"{hf}.norm2"),
            "fc1": _dense(state_dict, f"{hf}.mlp.fc1"),
            "fc2": _dense(state_dict, f"{hf}.mlp.fc2"),
            "ls2": {"lambda": _to_numpy(state_dict[f"{hf}.layer_scale2.lambda1"])},
        }
    return params


def port_dinov3_state_dict(state_dict: Mapping[str, Any], depth: int) -> dict:
    """Convert an HF ``DINOv3ViTModel`` state dict to the Flax ``DinoV3ViT``
    tree (register tokens; RoPE has no weights)."""
    params: dict[str, Any] = {
        "cls_token": _to_numpy(state_dict["embeddings.cls_token"]),
        "register_tokens": _to_numpy(state_dict["embeddings.register_tokens"]),
        "patch_embed": {
            "kernel": _conv_kernel(state_dict["embeddings.patch_embeddings.weight"]),
            "bias": _to_numpy(state_dict["embeddings.patch_embeddings.bias"]),
        },
        "ln": _ln(state_dict, "norm"),
    }
    for i in range(depth):
        hf = f"layer.{i}"
        params[f"block{i}"] = {
            "ln1": _ln(state_dict, f"{hf}.norm1"),
            "q_proj": _dense(state_dict, f"{hf}.attention.q_proj"),
            "k_proj": _dense(state_dict, f"{hf}.attention.k_proj"),
            "v_proj": _dense(state_dict, f"{hf}.attention.v_proj"),
            "o_proj": _dense(state_dict, f"{hf}.attention.o_proj"),
            "ls1": {"lambda": _to_numpy(state_dict[f"{hf}.layer_scale1.lambda1"])},
            "ln2": _ln(state_dict, f"{hf}.norm2"),
            "up_proj": _dense(state_dict, f"{hf}.mlp.up_proj"),
            "down_proj": _dense(state_dict, f"{hf}.mlp.down_proj"),
            "ls2": {"lambda": _to_numpy(state_dict[f"{hf}.layer_scale2.lambda1"])},
        }
    return params


def port_sam_state_dict(
    state_dict: Mapping[str, Any], depth: int, finetune_grid: int
) -> dict:
    """Convert an HF ``SamVisionEncoder`` state dict (``vision_encoder.*`` of
    facebook/sam-vit-*) to the Flax ``SamViT`` tree.

    The native 64x64 spatial pos-embed table is resized to the fine-tune
    grid with antialiased bicubic, mirroring the reference's init-time
    ``_resize_pos_embed`` (reference vit_sam.py:142-176). rel_pos_h/w are
    dropped (the reference disables rel-pos, vit_sam.py:71-75); the neck is
    dropped (forward bypasses it, vit_sam.py:103-139).
    """
    import torch
    import torch.nn.functional as F

    pos = state_dict["pos_embed"]
    if not hasattr(pos, "detach"):
        pos = torch.as_tensor(np.asarray(pos))
    if pos.shape[1] != finetune_grid:
        pos = pos.permute(0, 3, 1, 2)
        pos = F.interpolate(
            pos.float(), size=(finetune_grid, finetune_grid), mode="bicubic",
            antialias=True,
        )
        pos = pos.permute(0, 2, 3, 1)
    params: dict[str, Any] = {
        "pos_embed": _to_numpy(pos),
        "patch_embed": {
            "kernel": _conv_kernel(state_dict["patch_embed.projection.weight"]),
            "bias": _to_numpy(state_dict["patch_embed.projection.bias"]),
        },
    }
    for i in range(depth):
        hf = f"layers.{i}"
        params[f"block{i}"] = {
            "ln1": _ln(state_dict, f"{hf}.layer_norm1"),
            "qkv": _dense(state_dict, f"{hf}.attn.qkv"),
            "proj": _dense(state_dict, f"{hf}.attn.proj"),
            "ln2": _ln(state_dict, f"{hf}.layer_norm2"),
            "lin1": _dense(state_dict, f"{hf}.mlp.lin1"),
            "lin2": _dense(state_dict, f"{hf}.mlp.lin2"),
        }
    return params


def port_hiera_state_dict(state_dict: Mapping[str, Any], num_blocks: int) -> dict:
    """Convert an HF ``Sam2HieraDetModel`` state dict (the
    ``vision_encoder.backbone`` of facebook/sam2.1-hiera-*) to the Flax
    ``Hiera`` tree. Positional embeddings move NCHW -> NHWC."""
    params: dict[str, Any] = {
        "pos_embed": _to_numpy(state_dict["pos_embed"]).transpose(0, 2, 3, 1),
        "pos_embed_window": _to_numpy(
            state_dict["pos_embed_window"]
        ).transpose(0, 2, 3, 1),
        "patch_embed": {
            "kernel": _conv_kernel(state_dict["patch_embed.projection.weight"]),
            "bias": _to_numpy(state_dict["patch_embed.projection.bias"]),
        },
    }
    for i in range(num_blocks):
        hf = f"blocks.{i}"
        block: dict[str, Any] = {
            "ln1": _ln(state_dict, f"{hf}.layer_norm1"),
            "attn": {
                "qkv": _dense(state_dict, f"{hf}.attn.qkv"),
                "proj": _dense(state_dict, f"{hf}.attn.proj"),
            },
            "ln2": _ln(state_dict, f"{hf}.layer_norm2"),
            "fc1": _dense(state_dict, f"{hf}.mlp.proj_in"),
            "fc2": _dense(state_dict, f"{hf}.mlp.proj_out"),
        }
        if f"{hf}.proj.weight" in state_dict:
            block["proj"] = _dense(state_dict, f"{hf}.proj")
        params[f"block{i}"] = block
    return params


def _resize_token_pos_embed(pos: Any, target_grid: int, num_prefix: int = 1) -> np.ndarray:
    """Bicubic-resize a (1, prefix + g*g, D) token pos-embed table to
    ``target_grid`` (HF ``interpolate_pos_encoding`` semantics: fp32
    bicubic, align_corners=False). Port-time equivalent of the in-forward
    interpolation at a fixed fine-tune resolution."""
    import torch
    import torch.nn.functional as F

    p = pos if hasattr(pos, "detach") else torch.as_tensor(np.asarray(pos))
    n_grid = p.shape[1] - num_prefix
    src = int(round(float(n_grid) ** 0.5))
    if src == target_grid:
        return _to_numpy(p)
    prefix, grid_pos = p[:, :num_prefix], p[:, num_prefix:]
    d = p.shape[-1]
    grid_pos = grid_pos.reshape(1, src, src, d).permute(0, 3, 1, 2)
    grid_pos = F.interpolate(
        grid_pos.float(), size=(target_grid, target_grid), mode="bicubic",
        align_corners=False,
    )
    grid_pos = grid_pos.permute(0, 2, 3, 1).reshape(1, target_grid * target_grid, d)
    return _to_numpy(torch.cat([prefix.float(), grid_pos], dim=1))


def _strip_to_submodel(state_dict: Mapping[str, Any], prefixes: list[str]) -> dict:
    """If any key starts with one of ``prefixes``, keep only those keys with
    the prefix stripped (extracts e.g. the vision encoder from a full
    SamModel/Sam2Model checkpoint)."""
    for prefix in prefixes:
        sub = {
            k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)
        }
        if sub:
            return sub
    return dict(state_dict)


def port_backbone_checkpoint(
    backbone_arch: str, checkpoint_path: str, image_size: int = 256
) -> dict:
    """Port a local torch checkpoint for any backbone architecture.

    Single entry point replacing the reference's per-source download+remap
    logic (reference backbones/factory.py:238-334 and the HF wrappers in
    vit*.py). Detects and strips container prefixes (full SamModel /
    Sam2Model / lightning 'vit_mae.' checkpoints, MMPose 'backbone.'), and
    resizes position embeddings to the fine-tune grid at port time.

    Returns {"params": tree} (+ "batch_stats" for convnets) shaped to merge
    under the model's ``backbone`` collection.
    """
    state_dict = load_torch_checkpoint(checkpoint_path)
    grid = image_size // 16

    if backbone_arch.startswith("resnet"):
        from lightning_pose_tpu.models.backbones.resnet import RESNET_CONFIGS

        arch = "resnet50" if backbone_arch.startswith("resnet50_") else backbone_arch
        stage_sizes, bottleneck, _ = RESNET_CONFIGS[arch]
        params, batch_stats = port_resnet_state_dict(
            state_dict, tuple(stage_sizes), bottleneck
        )
        return {"params": params, "batch_stats": batch_stats}

    if backbone_arch.startswith("efficientnet"):
        from lightning_pose_tpu.models.backbones.efficientnet import (
            EFFICIENTNET_CONFIGS,
        )

        variant = backbone_arch.split("_")[-1]
        params, batch_stats = port_efficientnet_state_dict(state_dict, variant)
        return {"params": params, "batch_stats": batch_stats}

    if backbone_arch.endswith("_sam2"):
        from lightning_pose_tpu.models.backbones.hiera import HIERA_CONFIGS

        sd = _strip_to_submodel(
            state_dict, ["vision_encoder.backbone.", "image_encoder.trunk."]
        )
        n_blocks = sum(HIERA_CONFIGS[backbone_arch]["blocks_per_stage"])
        return {"params": port_hiera_state_dict(sd, n_blocks)}

    from lightning_pose_tpu.models.backbones.vit import VIT_CONFIGS

    size_key = backbone_arch.split("_")[0]
    _, depth, num_heads, _ = VIT_CONFIGS[size_key]

    if backbone_arch == "vitb_sam":
        sd = _strip_to_submodel(state_dict, ["vision_encoder."])
        return {"params": port_sam_state_dict(sd, depth, finetune_grid=grid)}
    if backbone_arch.endswith("_dinov2"):
        params = port_dinov2_state_dict(state_dict, depth, patch_size=16)
        params["pos_embed"] = _resize_token_pos_embed(params["pos_embed"], grid)
        return {"params": params}
    if backbone_arch.endswith("_dinov3"):
        return {"params": port_dinov3_state_dict(state_dict, depth)}

    # plain HF ViTModel family (dino, vit-mae); lightning MAE checkpoints
    # prefix with 'vit_mae.vit.' (reference vit.py:72-81), HF with 'vit.'
    sd = _strip_to_submodel(state_dict, ["vit_mae.vit.", "vit."])
    params = port_vit_state_dict(sd, depth, num_heads)
    params["pos_embed"] = _resize_token_pos_embed(params["pos_embed"], grid)
    return {"params": params}


def port_efficientnet_state_dict(
    state_dict: Mapping[str, Any], variant: str
) -> tuple[dict, dict]:
    """Convert a torchvision ``efficientnet_b0/b1/b2`` state dict to Flax
    trees matching :class:`...backbones.efficientnet.EfficientNet`.

    torchvision layout: ``features.0`` stem ConvNormActivation, ``features.1
    .. 7`` MBConv stages (block sublayers: [expand,] depthwise, SE,
    project), ``features.8`` head ConvNormActivation (reference
    backbones/factory.py:302-316 loads these via torchvision weights).
    """
    from lightning_pose_tpu.models.backbones.efficientnet import (
        _BASE_STAGES,
        _round_repeats,
        EFFICIENTNET_CONFIGS,
    )

    _, depth_mult, _ = EFFICIENTNET_CONFIGS[variant]
    params: dict[str, Any] = {}
    batch_stats: dict[str, Any] = {}

    def bn_pair(prefix: str) -> tuple[dict, dict]:
        return (
            {
                "scale": _to_numpy(state_dict[f"{prefix}.weight"]),
                "bias": _to_numpy(state_dict[f"{prefix}.bias"]),
            },
            {
                "mean": _to_numpy(state_dict[f"{prefix}.running_mean"]),
                "var": _to_numpy(state_dict[f"{prefix}.running_var"]),
            },
        )

    def conv(key: str, bias_key: str | None = None) -> dict:
        out = {"kernel": _conv_kernel(state_dict[key])}
        if bias_key and bias_key in state_dict:
            out["bias"] = _to_numpy(state_dict[bias_key])
        return out

    params["stem_conv"] = conv("features.0.0.weight")
    params["stem_bn"], batch_stats["stem_bn"] = bn_pair("features.0.1")

    for stage, (expand, _, layers, _, _) in enumerate(_BASE_STAGES):
        for i in range(_round_repeats(layers, depth_mult)):
            tvp = f"features.{stage + 1}.{i}.block"
            blk: dict[str, Any] = {}
            stats: dict[str, Any] = {}
            idx = 0
            if expand != 1:
                blk["expand_conv"] = conv(f"{tvp}.{idx}.0.weight")
                blk["expand_bn"], stats["expand_bn"] = bn_pair(f"{tvp}.{idx}.1")
                idx += 1
            blk["dw_conv"] = conv(f"{tvp}.{idx}.0.weight")
            blk["dw_bn"], stats["dw_bn"] = bn_pair(f"{tvp}.{idx}.1")
            idx += 1
            blk["se"] = {
                "reduce": conv(f"{tvp}.{idx}.fc1.weight", f"{tvp}.{idx}.fc1.bias"),
                "expand": conv(f"{tvp}.{idx}.fc2.weight", f"{tvp}.{idx}.fc2.bias"),
            }
            idx += 1
            blk["project_conv"] = conv(f"{tvp}.{idx}.0.weight")
            blk["project_bn"], stats["project_bn"] = bn_pair(f"{tvp}.{idx}.1")
            params[f"stage{stage + 1}_{i}"] = blk
            batch_stats[f"stage{stage + 1}_{i}"] = stats

    params["head_conv"] = conv("features.8.0.weight")
    params["head_bn"], batch_stats["head_bn"] = bn_pair("features.8.1")
    return params, batch_stats
