"""Output-fidelity check: our decode vs a literal torch reimplementation of
the reference's run_subpixelmaxima (reference heads/heatmap.py:86-144).

The reference upsamples with torch bicubic (align_corners=False, Keys
a=-0.75) + kornia's pyramid blur, then softmax(T)->expectation->window
confidence. JAX's bicubic uses the Keys a=-0.5 kernel, so agreement is
tolerance-level, not bit-exact (SURVEY §7 "output fidelity"). This test
pins the divergence: < 0.5 px on keypoints, < 0.02 on confidences.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lightning_pose_tpu.data.heatmaps import generate_heatmaps
from lightning_pose_tpu.ops.softargmax import run_subpixelmaxima


def _torch_pyramid_kernel():
    k1 = torch.tensor([1.0, 4.0, 6.0, 4.0, 1.0])
    return (torch.outer(k1, k1) / 256.0)[None, None]


def _torch_upsample(hm: torch.Tensor) -> torch.Tensor:
    """reference upsample(): bicubic 2x (align_corners=False) + 5x5 blur
    with constant border."""
    b, k, h, w = hm.shape
    up = F.interpolate(hm, size=(2 * h, 2 * w), mode="bicubic", align_corners=False)
    kern = _torch_pyramid_kernel().repeat(k, 1, 1, 1)
    up = F.conv2d(F.pad(up, (2, 2, 2, 2), mode="constant", value=0.0), kern, groups=k)
    return up


def _torch_run_subpixelmaxima(hm: torch.Tensor, df: int, temperature: float = 1000.0):
    for _ in range(df):
        hm = _torch_upsample(hm)
    b, k, h, w = hm.shape
    flat = (hm * temperature).reshape(b, k, -1)
    soft = torch.softmax(flat, dim=-1).reshape(b, k, h, w)
    xs = torch.arange(w, dtype=torch.float64)
    ys = torch.arange(h, dtype=torch.float64)
    soft64 = soft.double()
    px = (soft64.sum(dim=2) * xs).sum(dim=-1)
    py = (soft64.sum(dim=3) * ys).sum(dim=-1)
    # windowed confidence: 5x5 sum around truncated-int peak, zero padding
    pad = 2
    padded = F.pad(soft, (pad, pad, pad, pad))
    conf = torch.zeros(b, k)
    for bi in range(b):
        for ki in range(k):
            xi = int(px[bi, ki]) + pad
            yi = int(py[bi, ki]) + pad
            conf[bi, ki] = padded[bi, ki, yi - 2:yi + 3, xi - 2:xi + 3].sum()
    offset = {1: 0.5, 2: 1.5, 3: 2.5}[df]
    preds = torch.stack([px - offset, py - offset], dim=-1)
    return preds.float(), conf


@pytest.mark.parametrize("df", [1, 2])
def test_decode_matches_torch_reference(rng, df):
    kps = rng.uniform(15, 110, size=(3, 4, 2)).astype(np.float32)
    hm = np.asarray(generate_heatmaps(kps, 128, 128, (32, 32)))  # (B,H,W,K)

    ours_kp, ours_conf = run_subpixelmaxima(hm, downsample_factor=df)
    ours_kp = np.asarray(ours_kp).reshape(3, 4, 2)
    ours_conf = np.asarray(ours_conf)

    hm_t = torch.tensor(hm).permute(0, 3, 1, 2)  # NCHW for torch
    ref_kp, ref_conf = _torch_run_subpixelmaxima(hm_t, df)
    ref_kp = ref_kp.numpy()
    ref_conf = ref_conf.numpy()

    kp_err = np.abs(ours_kp - ref_kp).max()
    conf_err = np.abs(ours_conf - ref_conf).max()
    assert kp_err < 0.5, f"keypoint divergence {kp_err} px"
    assert conf_err < 0.02, f"confidence divergence {conf_err}"
    if df == 2:
        # with df=2 the decode returns full-resolution coords, so the peaks
        # should recover the generating keypoints to sub-pixel level
        recover_err = np.abs(ours_kp - kps).max()
        assert recover_err < 1.0, f"recovery error {recover_err} px"
