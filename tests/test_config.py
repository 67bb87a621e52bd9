"""Tests for the OmegaConf-subset config system."""

import os

import pytest

from lightning_pose_tpu.config import Config, default_config, load_config


def test_attribute_and_item_access():
    cfg = Config({"a": {"b": 1, "c": [1, 2, 3]}})
    assert cfg.a.b == 1
    assert cfg["a"]["b"] == 1
    assert cfg.a.c == [1, 2, 3]


def test_get_with_default():
    cfg = Config({"a": {"b": None}})
    assert cfg.a.get("b", 5) == 5  # None -> default (OmegaConf semantics)
    assert cfg.a.get("missing", "x") == "x"


def test_interpolation():
    cfg = Config({"data": {"data_dir": "/tmp/d", "video_dir": "${data.data_dir}/videos"}})
    assert cfg.data.video_dir == "/tmp/d/videos"
    # interpolation is lazy: updating the source updates the target
    cfg.data.data_dir = "/other"
    assert cfg.data.video_dir == "/other/videos"


def test_lp_root_path_resolver():
    cfg = Config({"p": "${LP_ROOT_PATH:}/data"})
    from lightning_pose_tpu import LP_ROOT_PATH

    assert cfg.p == LP_ROOT_PATH + "/data"


def test_overrides():
    cfg = default_config()
    cfg.apply_overrides(
        ["training.max_epochs=5", "model.backbone=resnet18", "data.num_keypoints=17"]
    )
    assert cfg.training.max_epochs == 5
    assert cfg.model.backbone == "resnet18"
    assert cfg.data.num_keypoints == 17


def test_override_parses_yaml_types():
    cfg = Config({"x": {}})
    cfg.apply_overrides(["x.a=1e-3", "x.b=[1,2]", "x.c=null", "x.d=true"])
    assert cfg.x.a == pytest.approx(1e-3)
    assert cfg.x.b == [1, 2]
    assert cfg.x.get("c") is None
    assert cfg.x.d is True


def test_merge_deep():
    cfg = default_config()
    cfg.merge_with({"training": {"max_epochs": 7}})
    assert cfg.training.max_epochs == 7
    assert cfg.training.train_batch_size == 16  # untouched sibling


def test_yaml_roundtrip(tmp_path):
    cfg = default_config()
    path = os.path.join(tmp_path, "cfg.yaml")
    cfg.save(path)
    cfg2 = Config.from_yaml(path)
    assert cfg2.training.train_batch_size == cfg.training.train_batch_size
    assert cfg2.eval.test_videos_directory == cfg.data.video_dir


def test_default_schema_sections():
    cfg = default_config()
    for section in ["data", "training", "model", "dali", "losses", "eval", "callbacks"]:
        assert section in cfg, section


def test_load_config_with_defaults(tmp_path):
    p = tmp_path / "user.yaml"
    p.write_text("training:\n  max_epochs: 3\n")
    cfg = load_config(str(p), overrides=["model.model_type=regression"])
    assert cfg.training.max_epochs == 3
    assert cfg.model.model_type == "regression"
    assert cfg.losses.temporal.epsilon == 20.0  # from defaults


def test_copy_is_independent():
    cfg = default_config()
    cfg2 = cfg.copy()
    cfg2.training.max_epochs = 1
    assert cfg.training.max_epochs == 300
