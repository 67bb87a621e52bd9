"""Tests for ModelConfig validation (reference tests/api/test_model_config.py)."""

import pytest

from lightning_pose_tpu.api.model_config import InvalidConfig, ModelConfig


def test_valid_config_passes(cfg):
    ModelConfig(cfg).validate()


def test_resize_dims_must_be_multiple_of_128(cfg):
    c = cfg.copy()
    c.data.image_resize_dims.height = 100
    with pytest.raises(InvalidConfig):
        ModelConfig(c).validate()


def test_keypoint_count_mismatch(cfg):
    c = cfg.copy()
    c.data.num_keypoints = 5
    with pytest.raises(InvalidConfig):
        ModelConfig(c).validate()


def test_split_probabilities(cfg):
    c = cfg.copy()
    c.training.train_prob = 0.9
    c.training.val_prob = 0.3
    with pytest.raises(InvalidConfig):
        ModelConfig(c).validate()


def test_ckpt_divisibility(cfg):
    c = cfg.copy()
    c.training.check_val_every_n_epoch = 2
    c.training.ckpt_every_n_epochs = 3
    with pytest.raises(InvalidConfig):
        ModelConfig(c).validate()


def test_steps_xor_epochs(cfg):
    c = cfg.copy()
    c.training.max_steps = 100  # mixing with max_epochs
    with pytest.raises(InvalidConfig):
        ModelConfig(c).validate()

    c2 = cfg.copy()
    c2.training.max_epochs = None
    c2.training.min_epochs = None
    c2.training.unfreezing_epoch = None
    with pytest.raises(InvalidConfig):  # neither mode set
        ModelConfig(c2).validate()


def test_invalid_model_type(cfg):
    c = cfg.copy()
    c.model.model_type = "not_a_model"
    with pytest.raises(InvalidConfig):
        ModelConfig(c).validate()


def test_non_numeric_log_weight(cfg):
    c = cfg.copy()
    c.model.losses_to_use = ["temporal"]
    c.losses.temporal.log_weight = "high"
    with pytest.raises(InvalidConfig):
        ModelConfig(c).validate()


def test_multiview_single_entry_raises(cfg):
    c = cfg.copy()
    c.data.view_names = ["only_one"]
    with pytest.raises(ValueError):
        ModelConfig(c).is_multi_view()


def test_multiview_detection(cfg):
    c = cfg.copy()
    assert ModelConfig(c).is_single_view()
    c.data.view_names = ["a", "b"]
    assert ModelConfig(c).is_multi_view()


def test_milestones_must_not_exceed_max_epochs(cfg):
    c = cfg.copy()
    c.training.lr_scheduler_params.multisteplr.milestones = [1, 100]
    with pytest.raises(InvalidConfig, match="exceeds max_epochs"):
        ModelConfig(c).validate()


def test_milestone_steps_must_not_exceed_max_steps(cfg):
    c = cfg.copy()
    c.training.max_epochs = None
    c.training.min_epochs = None
    c.training.unfreezing_epoch = None
    c.training.max_steps = 50
    c.training.min_steps = 50
    c.training.unfreezing_step = 10
    c.training.lr_scheduler_params.multisteplr.milestones = None
    c.training.lr_scheduler_params.multisteplr.milestone_steps = [60]
    with pytest.raises(InvalidConfig, match="exceeds max_steps"):
        ModelConfig(c).validate()


def test_multiview_csv_count_mismatch(cfg):
    c = cfg.copy()
    c.data.view_names = ["a", "b"]
    c.data.csv_file = ["a.csv", "b.csv", "c.csv"]
    with pytest.raises(InvalidConfig, match="csv_file"):
        ModelConfig(c).validate()


def test_multiview_non_transformer_warns(cfg):
    c = cfg.copy()
    c.data.view_names = ["a", "b"]
    c.data.csv_file = ["a.csv", "b.csv"]
    c.model.model_type = "heatmap"
    with pytest.warns(UserWarning, match="heatmap_multiview_transformer"):
        ModelConfig(c).validate()


def test_reprojection_loss_requires_dlc_imgaug_3d(cfg):
    c = cfg.copy()
    c.data.view_names = ["a", "b"]
    c.data.csv_file = ["a.csv", "b.csv"]
    c.model.model_type = "heatmap_multiview_transformer"
    c.losses.supervised_reprojection_heatmap_mse = {"log_weight": 0.0}
    c.training.imgaug = "none"
    with pytest.raises(InvalidConfig, match="imgaug must be 'dlc'"):
        ModelConfig(c).validate()
    c.training.imgaug = "dlc"
    with pytest.raises(InvalidConfig, match="imgaug_3d"):
        ModelConfig(c).validate()
    c.training.imgaug_3d = True
    ModelConfig(c).validate()


def test_num_keypoints_must_be_set(cfg):
    c = cfg.copy()
    c.data.num_keypoints = None
    c.data.keypoint_names = None
    with pytest.raises(InvalidConfig, match="num_keypoints must be set"):
        ModelConfig(c).validate()


def test_num_keypoints_must_be_positive(cfg):
    c = cfg.copy()
    c.data.num_keypoints = 0
    c.data.keypoint_names = None
    with pytest.raises(InvalidConfig, match="positive"):
        ModelConfig(c).validate()


def test_keypoint_names_none_skips_count_check(cfg):
    c = cfg.copy()
    c.data.keypoint_names = None
    ModelConfig(c).validate()


def test_resize_dims_none_skipped(cfg):
    """Unset resize dims pass validation (reference
    model_config.py:171-176 only checks dims that are set)."""
    c = cfg.copy()
    c.data.image_resize_dims.height = None
    ModelConfig(c).validate()


def test_ckpt_every_none_skipped(cfg):
    c = cfg.copy()
    c.training.ckpt_every_n_epochs = None
    ModelConfig(c).validate()


def test_missing_loss_cfg_entry_skipped(cfg):
    """A loss named in losses_to_use with no cfg.losses entry passes
    validation (it fails later at factory build, like the reference)."""
    c = cfg.copy()
    c.model.losses_to_use = ["nonexistent_loss"]
    ModelConfig(c).validate()


def test_null_log_weight_skipped(cfg):
    """log_weight: null marks the loss inactive; validation passes."""
    c = cfg.copy()
    c.model.losses_to_use = ["temporal"]
    c.losses.temporal.log_weight = None
    ModelConfig(c).validate()


def test_empty_losses_to_use_passes(cfg):
    c = cfg.copy()
    c.model.losses_to_use = []
    ModelConfig(c).validate()


def test_milestone_equal_to_max_epochs_passes(cfg):
    """Reference asserts m <= max_epochs, so equality is allowed."""
    c = cfg.copy()
    c.training.max_epochs = 300
    c.training.lr_scheduler_params.multisteplr.milestones = [300]
    ModelConfig(c).validate()


def test_mhcrnn_context_mode_validated(cfg):
    c = cfg.copy()
    c.model.mhcrnn_context_mode = "repeat_center"
    ModelConfig(c).validate()
    c.model.mhcrnn_context_mode = "nearest"
    with pytest.raises(InvalidConfig, match="mhcrnn_context_mode"):
        ModelConfig(c).validate()


def test_reprojection_null_log_weight_skips_imgaug_check(cfg):
    """An inactive reprojection loss (log_weight null or section absent)
    does not impose imgaug requirements (reference
    test_model_config.py:338-358)."""
    c = cfg.copy()
    c.data.view_names = ["a", "b"]
    c.data.csv_file = ["a.csv", "b.csv"]
    c.model.model_type = "heatmap_multiview_transformer"
    c.training.imgaug = "none"
    c.losses.supervised_reprojection_heatmap_mse = {"log_weight": None}
    ModelConfig(c).validate()
    # no section at all -> also skipped
    c2 = cfg.copy()
    c2.data.view_names = ["a", "b"]
    c2.data.csv_file = ["a.csv", "b.csv"]
    c2.model.model_type = "heatmap_multiview_transformer"
    c2.training.imgaug = "none"
    assert c2.losses.get("supervised_reprojection_heatmap_mse") is None
    ModelConfig(c2).validate()


def test_video_files_singleview_on_multiview_raises(cfg, tmp_path):
    """View-arity guards on the test-video enumerators (reference
    model_config.py:103,121)."""
    c = cfg.copy()
    c.data.view_names = ["a", "b"]
    c.data.csv_file = ["a.csv", "b.csv"]
    c.eval.test_videos_directory = str(tmp_path)
    with pytest.raises(AssertionError):
        ModelConfig(c).test_video_files_singleview()
    with pytest.raises(AssertionError):
        ModelConfig(cfg).test_video_files_multiview()


def test_video_files_singleview_returns_paths(cfg, tmp_path):
    (tmp_path / "sess1.mp4").write_bytes(b"x")
    (tmp_path / "notes.txt").write_bytes(b"x")
    c = cfg.copy()
    c.eval.test_videos_directory = str(tmp_path)
    files = ModelConfig(c).test_video_files_singleview()
    assert [str(f).rsplit("/", 1)[-1] for f in files] == ["sess1.mp4"]


def test_video_files_multiview_returns_grouped_paths(cfg, tmp_path):
    for name in ["sess1_top.mp4", "sess1_bot.mp4", "sess2_top.mp4", "sess2_bot.mp4"]:
        (tmp_path / name).write_bytes(b"x")
    c = cfg.copy()
    c.data.view_names = ["top", "bot"]
    c.data.csv_file = ["top.csv", "bot.csv"]
    c.eval.test_videos_directory = str(tmp_path)
    groups = ModelConfig(c).test_video_files_multiview()
    assert len(groups) == 2
    for group in groups:
        assert [v.name.split("_")[-1] for v in group] == ["top.mp4", "bot.mp4"]
