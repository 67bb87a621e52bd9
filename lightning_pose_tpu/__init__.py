"""lightning_pose_tpu: a TPU-native animal pose estimation framework.

A ground-up JAX/Flax/XLA/Pallas re-design of the capabilities of Lightning Pose
(reference: lightning_pose/__init__.py). Heatmap pose trackers (ResNet + ViT
backbones), Gaussian target heatmaps, soft-argmax decoding, unsupervised
temporal / PCA / unimodal losses over unlabeled video, the ``litpose`` CLI,
and the Hydra-style config schema — all built TPU-first:

- NHWC tensor layouts, bfloat16 MXU compute, fp32 parameters.
- One jitted, donated train step; data parallelism via ``jax.sharding`` over a
  1-D device mesh (GSPMD inserts the collectives; batch-norm statistics are
  computed over the global batch, which subsumes the reference's
  ``sync_batchnorm=True``).
- Host-side video decode (C++ decoders via OpenCV) feeding fused on-device
  preprocess (resize + normalize + augment) — the DALI replacement.
- Target-heatmap generation and soft-argmax decode fused into the jitted
  step instead of running per-frame on the host.
"""

import os

# version from the installed package metadata (reference cli/main.py reads
# importlib.metadata the same way); fall back to the pyproject value for
# source checkouts
try:
    from importlib.metadata import version as _pkg_version

    __version__ = _pkg_version("lightning-pose-tpu")
except Exception:  # pragma: no cover - not installed
    __version__ = "0.2.0"

# Absolute path to the repository root, used by the ``${LP_ROOT_PATH:}``
# config resolver (mirrors the OmegaConf resolver in the reference
# lightning_pose/__init__.py:9-10).
LP_ROOT_PATH = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
