"""Training-behavior tests that parse the written TensorBoard event files —
the analog of the reference's tbparse-based tests
(reference tests/test_training/test_lr.py, test_train_duration.py).

tbparse/TF are not installed here; events are read directly from the
TFRecord framing with tensorboardX's bundled protos.
"""

import glob
import math
import struct
from collections import defaultdict

import pytest


def read_tb_scalars(logdir: str) -> dict[str, list[tuple[int, float]]]:
    """tag -> [(step, value), ...] from every event file under logdir."""
    from tensorboardX.proto import event_pb2

    out: dict[str, list[tuple[int, float]]] = defaultdict(list)
    for path in sorted(glob.glob(f"{logdir}/**/events.out.tfevents*",
                                 recursive=True)):
        with open(path, "rb") as f:
            data = f.read()
        pos = 0
        while pos + 12 <= len(data):
            (length,) = struct.unpack_from("<Q", data, pos)
            pos += 12  # u64 length + u32 length-crc
            if pos + length + 4 > len(data):
                break
            event = event_pb2.Event.FromString(data[pos:pos + length])
            pos += length + 4  # payload + u32 data-crc
            for v in event.summary.value:
                if v.HasField("simple_value"):
                    out[v.tag].append((event.step, v.simple_value))
    for tag in out:
        out[tag].sort()
    return dict(out)


@pytest.mark.slow
def test_lr_schedules_in_tb_logs(cfg, tmp_path):
    """Logged lr-head/lr-backbone follow the unfreeze warm-up and milestone
    semantics (reference test_lr.py:30-70): backbone at 0 before the
    unfreeze epoch, warm-up from 0.1x head LR by 1.5x/epoch, head LR halves
    at the milestone."""
    from lightning_pose_tpu.train import train

    c = cfg.copy()
    c.training.max_epochs = 6
    c.training.min_epochs = 6
    c.training.unfreezing_epoch = 1
    c.training.check_val_every_n_epoch = 10
    c.training.train_batch_size = 4
    c.training.train_frames = 8  # -> 2 steps/epoch
    c.training.log_every_n_steps = 1
    c.training.imgaug = "default"
    c.training.lr_scheduler_params.multisteplr.milestones = [5]
    c.training.lr_scheduler_params.multisteplr.gamma = 0.5
    c.model.model_name = "tb-lr-test"
    c.eval.predict_vids_after_training = False
    train(c, model_dir=tmp_path, skip_evaluation=True)

    scalars = read_tb_scalars(str(tmp_path / "tb_logs" / "tb-lr-test"))
    assert "lr-head" in scalars and "lr-backbone" in scalars
    head = dict(scalars["lr-head"])
    backbone = dict(scalars["lr-backbone"])
    base_lr = float(c.training.optimizer_params.get("learning_rate", 1e-3))
    spe = 2  # steps per epoch

    # head: base LR until the milestone epoch, then halved
    assert math.isclose(head[1 * spe], base_lr, rel_tol=1e-6)
    assert math.isclose(head[4 * spe], base_lr, rel_tol=1e-6)
    assert math.isclose(head[5 * spe + 1], base_lr * 0.5, rel_tol=1e-6)

    # backbone: frozen (0) during epoch 0; at the unfreeze epoch it starts
    # at 0.1x head LR, then warms by 1.5x per epoch
    assert backbone[1] == 0.0  # step 1 is inside epoch 0
    assert math.isclose(backbone[1 * spe + 1], 0.1 * base_lr, rel_tol=1e-5)
    assert math.isclose(
        backbone[2 * spe + 1], 0.1 * base_lr * 1.5, rel_tol=1e-5
    )
    assert math.isclose(
        backbone[3 * spe + 1], 0.1 * base_lr * 1.5**2, rel_tol=1e-5
    )

    # loss scalars are present and finite
    assert any(k.endswith("supervised_loss") for k in scalars)


@pytest.mark.slow
def test_train_duration_steps_in_tb_logs(cfg, tmp_path):
    """Epoch-mode runs log exactly max_epochs * steps_per_epoch train steps
    (reference test_train_duration.py)."""
    from lightning_pose_tpu.train import train

    c = cfg.copy()
    c.training.max_epochs = 3
    c.training.min_epochs = 3
    c.training.unfreezing_epoch = 0
    c.training.check_val_every_n_epoch = 10
    c.training.train_batch_size = 4
    c.training.train_frames = 8  # -> 2 steps/epoch
    c.training.log_every_n_steps = 1
    c.training.imgaug = "default"
    c.training.lr_scheduler_params.multisteplr.milestones = [2]
    c.model.model_name = "tb-duration-test"
    c.eval.predict_vids_after_training = False
    train(c, model_dir=tmp_path, skip_evaluation=True)

    scalars = read_tb_scalars(str(tmp_path / "tb_logs" / "tb-duration-test"))
    steps = [s for s, _ in scalars["lr-head"]]
    assert steps == list(range(1, 7))  # 3 epochs x 2 steps
    epochs = dict(scalars["epoch"])
    assert epochs[2] == 0 and epochs[4] == 1 and epochs[6] == 2


@pytest.mark.slow
def test_scanned_epochs_log_every_step(cfg, tmp_path):
    """The scanned-epoch path materializes each epoch's log stack ONE epoch
    late (so host decode/transfer overlaps device compute) with a final
    flush after the loop — the TB record must still contain exactly
    max_epochs * steps_per_epoch steps with correct epoch tags."""
    from lightning_pose_tpu.train import train

    c = cfg.copy()
    c.training.max_epochs = 3
    c.training.min_epochs = 3
    c.training.unfreezing_epoch = 0
    c.training.check_val_every_n_epoch = 10
    c.training.train_batch_size = 4
    c.training.train_frames = 8  # -> 2 steps/epoch
    c.training.log_every_n_steps = 1
    c.training.imgaug = "default"
    c.training.scan_epochs = True
    c.training.lr_scheduler_params.multisteplr.milestones = [2]
    c.model.model_name = "tb-scanlog-test"
    c.eval.predict_vids_after_training = False
    train(c, model_dir=tmp_path, skip_evaluation=True)

    scalars = read_tb_scalars(str(tmp_path / "tb_logs" / "tb-scanlog-test"))
    steps = [s for s, _ in scalars["lr-head"]]
    assert steps == list(range(1, 7))  # 3 epochs x 2 steps, final flushed
    epochs = dict(scalars["epoch"])
    assert epochs[2] == 0 and epochs[4] == 1 and epochs[6] == 2
    loss_tags = [k for k in scalars if k.endswith("supervised_loss")]
    assert loss_tags and len(scalars[loss_tags[0]]) == 6


@pytest.mark.slow
def test_early_stopping_halts_before_max_epochs(cfg, tmp_path):
    """With a divergent LR the val loss never improves after the first
    check; early stopping halts after `patience` bad val checks
    (reference callbacks.py get_callbacks EarlyStopping semantics)."""
    from lightning_pose_tpu.train import train

    c = cfg.copy()
    c.training.max_epochs = 12
    c.training.min_epochs = 1
    c.training.check_val_every_n_epoch = 1
    c.training.early_stopping = True
    c.training.early_stop_patience = 2
    c.training.unfreezing_epoch = 0
    c.training.optimizer_params.learning_rate = 1e6  # diverge immediately
    c.training.lr_scheduler_params.multisteplr.milestones = [11]
    c.model.model_name = "earlystop-test"
    c.eval.predict_vids_after_training = False
    train(c, model_dir=tmp_path, skip_evaluation=True)

    scalars = read_tb_scalars(str(tmp_path / "tb_logs"))
    epochs_logged = {int(v) for _, v in scalars["epoch"]}
    # stopped well before max_epochs (first val is best; the next
    # `patience` checks are all worse/NaN)
    assert max(epochs_logged) < 11
    # a best checkpoint exists despite the early stop
    from lightning_pose_tpu.utils.io import ckpt_path_from_base_path

    ckpt = ckpt_path_from_base_path(str(tmp_path), "earlystop-test")
    assert ckpt is not None and ckpt.endswith("-best.ckpt")


@pytest.mark.slow
def test_ckpt_every_n_epochs_writes_periodic_checkpoints(cfg, tmp_path):
    """cfg.training.ckpt_every_n_epochs writes non-best epoch checkpoints
    alongside the best one (reference callbacks.py:628-689)."""
    import glob as globmod

    from lightning_pose_tpu.train import train

    c = cfg.copy()
    c.training.max_epochs = 4
    c.training.min_epochs = 4
    c.training.check_val_every_n_epoch = 1
    c.training.ckpt_every_n_epochs = 2
    c.training.unfreezing_epoch = 0
    c.training.lr_scheduler_params.multisteplr.milestones = [3]
    c.model.model_name = "ckpt-every-test"
    c.eval.predict_vids_after_training = False
    train(c, model_dir=tmp_path, skip_evaluation=True)

    ckpts = sorted(
        globmod.glob(str(tmp_path / "tb_logs" / "ckpt-every-test" /
                         "version_0" / "checkpoints" / "*.ckpt"))
    )
    names = [c.split("/")[-1] for c in ckpts]
    # periodic (non-best) checkpoints at epochs 1 and 3
    periodic = [n for n in names if "-best" not in n]
    assert any(n.startswith("epoch=1-") for n in periodic)
    assert any(n.startswith("epoch=3-") for n in periodic)
    assert any("-best" in n for n in names)
