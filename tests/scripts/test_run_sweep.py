"""Hyper-sweep launcher grid semantics
(reference tests/scripts/hyper_sweep/test_run_sweep.py)."""

import sys
from pathlib import Path

SCRIPTS = Path(__file__).parents[2] / "scripts" / "hyper_sweep"
sys.path.insert(0, str(SCRIPTS))

import run_sweep  # noqa: E402


def test_sweep_grid_expansion(tmp_path, monkeypatch, cfg):
    """Two axes with 2 values each -> 4 jobs, cartesian overrides applied,
    one output dir per combination."""
    cfg_file = tmp_path / "cfg.yaml"
    cfg.save(str(cfg_file))

    calls = []

    def fake_train(cfg_obj, model_dir=None, **kwargs):
        calls.append(
            (
                float(cfg_obj.training.optimizer_params.learning_rate),
                str(cfg_obj.model.backbone),
                Path(model_dir),
            )
        )

    import lightning_pose_tpu.train as train_mod

    monkeypatch.setattr(train_mod, "train", fake_train)

    argv = sys.argv
    try:
        sys.argv = [
            "run_sweep.py", str(cfg_file),
            "--sweep", "training.optimizer_params.learning_rate=0.001,0.0005",
            "--sweep", "model.backbone=resnet18,resnet34",
            "--output_root", str(tmp_path / "sweep"),
        ]
        run_sweep.main()
    finally:
        sys.argv = argv

    assert len(calls) == 4
    assert sorted({(lr, bb) for lr, bb, _ in calls}) == [
        (0.0005, "resnet18"), (0.0005, "resnet34"),
        (0.001, "resnet18"), (0.001, "resnet34"),
    ]
    dirs = {d for *_, d in calls}
    assert len(dirs) == 4
    for d in dirs:
        assert d.exists() and str(d).startswith(str(tmp_path / "sweep"))


def test_sweep_no_axes_single_job(tmp_path, monkeypatch, cfg):
    cfg_file = tmp_path / "cfg.yaml"
    cfg.save(str(cfg_file))
    calls = []

    import lightning_pose_tpu.train as train_mod

    monkeypatch.setattr(
        train_mod, "train", lambda c, model_dir=None, **k: calls.append(model_dir)
    )
    argv = sys.argv
    try:
        sys.argv = [
            "run_sweep.py", str(cfg_file),
            "--output_root", str(tmp_path / "sweep"),
        ]
        run_sweep.main()
    finally:
        sys.argv = argv
    assert len(calls) == 1
    assert Path(calls[0]).name == "job000_base"
