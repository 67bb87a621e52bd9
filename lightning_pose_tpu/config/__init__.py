"""Config system: a small OmegaConf/Hydra-compatible subset.

The reference threads a single Hydra/OmegaConf ``cfg`` through every factory
(reference scripts/configs/config_default.yaml, lightning_pose/train.py:85).
This package preserves that schema and access idiom (attribute access, string
interpolation ``${data.video_dir}``, the ``${LP_ROOT_PATH:}`` resolver, and
``key=value`` dotted overrides) without depending on omegaconf.
"""

from lightning_pose_tpu.config.conf import (
    Config,
    DictConfig,
    load_config,
    merge,
    register_resolver,
)
from lightning_pose_tpu.config.defaults import default_config

__all__ = [
    "Config",
    "DictConfig",
    "load_config",
    "merge",
    "register_resolver",
    "default_config",
]
