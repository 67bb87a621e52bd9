"""Learning-rate and anneal-weight schedules as pure functions of the step.

The reference drives these through Lightning callbacks
(MultiStepLR: reference train.py:325-332; UnfreezeBackbone:
reference callbacks.py:79-188; AnnealWeight: reference callbacks.py:32-76).
Here every schedule is a closed-form jittable function of the global step,
so the whole training step — including the backbone-unfreeze warm-up —
compiles into one XLA program with no host-side mutation.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "multistep_lr",
    "backbone_lr",
    "anneal_weight",
]


def multistep_lr(
    base_lr: float,
    milestones: list[int],
    gamma: float,
    steps_per_epoch: int,
):
    """MultiStepLR: multiply by gamma at each milestone epoch."""
    boundaries = jnp.asarray(
        [m * steps_per_epoch for m in sorted(milestones)], dtype=jnp.int32
    )

    def schedule(step):
        n_passed = jnp.sum(step >= boundaries)
        return base_lr * gamma**n_passed

    return schedule


def backbone_lr(
    base_lr: float,
    milestones: list[int],
    gamma: float,
    steps_per_epoch: int,
    unfreezing_epoch: int | None = None,
    unfreezing_step: int | None = None,
    initial_ratio: float = 0.1,
    warm_up_ratio: float = 1.5,
):
    """Backbone LR: 0 until unfreeze, then warm up x1.5/epoch from
    0.1 x head LR until it catches the head LR (reference callbacks.py:142-188).

    In epoch mode the warm-up advances per epoch; in step mode per step.
    """
    assert (unfreezing_epoch is None) != (unfreezing_step is None)
    head = multistep_lr(base_lr, milestones, gamma, steps_per_epoch)

    if unfreezing_epoch is not None:
        unfreeze_units = unfreezing_epoch

        def unit_of(step):
            return step // steps_per_epoch
    else:
        unfreeze_units = unfreezing_step

        def unit_of(step):
            return step

    def schedule(step):
        unit = unit_of(step)
        head_now = head(step)
        # head LR at the unfreeze point (for the stored initial value,
        # reference callbacks.py:173-176)
        if unfreezing_epoch is not None:
            unfreeze_step0 = unfreeze_units * steps_per_epoch
        else:
            unfreeze_step0 = unfreeze_units
        initial = initial_ratio * head(jnp.asarray(unfreeze_step0))
        since = jnp.maximum(unit - unfreeze_units, 0)
        warm = jnp.minimum(initial * warm_up_ratio ** since.astype(jnp.float32), head_now)
        return jnp.where(unit < unfreeze_units, 0.0, warm)

    return schedule


def anneal_weight(
    epoch,
    init_val: float = 0.0,
    increase_factor: float = 0.01,
    final_val: float = 1.0,
    freeze_until_epoch: int = 0,
):
    """Unsupervised-loss importance ramp (reference callbacks.py:59-76).

    Value stays at ``init_val`` through ``freeze_until_epoch``, then rises by
    ``increase_factor`` per epoch, capped at ``final_val``.
    """
    eff = jnp.maximum(epoch - freeze_until_epoch, 0)
    return jnp.where(
        epoch <= freeze_until_epoch,
        init_val,
        jnp.minimum(init_val + eff * increase_factor, final_val),
    )
