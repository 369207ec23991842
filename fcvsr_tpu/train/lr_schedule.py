"""LR schedules matching the reference recipes.

* ``multistep`` — CVSR_train: Adam 0.5e-5, MultiStepLR milestones
  [2000, 6000, 10000, 120000], gamma 0.25 (train_LD_freqCVSR_22.py:203-205).
* ``cosine_restart`` — mmedit FCVSR configs: CosineRestart periods=[600000],
  restart_weights=[1], min_lr=1e-7 (fcvsr_redsLD_QP37.py:100-105); the
  general multi-period/restart-weight form is supported for other configs.
* ``linear`` — mmedit custom LinearLrUpdaterHook (core/scheduler/lr_updater.py).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax

__all__ = ["multistep", "cosine_restart", "linear_decay"]


def multistep(base_lr: float, milestones: Sequence[int], gamma: float = 0.25):
    boundaries = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def cosine_restart(base_lr: float, periods: Sequence[int],
                   restart_weights: Sequence[float] = (1.0,),
                   min_lr: float = 1e-7):
    """mmcv CosineRestartLrUpdaterHook semantics: within period i,
    lr = min_lr + (base_lr*w_i - min_lr) * 0.5*(1 + cos(pi * t/T_i))."""
    assert len(periods) == len(restart_weights)
    cum = [0]
    for p in periods:
        cum.append(cum[-1] + p)

    def schedule(step):
        step = jnp.asarray(step)
        lr = jnp.asarray(min_lr, jnp.float32)
        for i, (period, weight) in enumerate(zip(periods, restart_weights)):
            start, end = cum[i], cum[i + 1]
            in_seg = (step >= start) & (step < end)
            t = jnp.clip((step - start) / period, 0.0, 1.0)
            seg_lr = min_lr + (base_lr * weight - min_lr) * 0.5 * (
                1 + jnp.cos(jnp.pi * t)
            )
            lr = jnp.where(in_seg, seg_lr, lr)
        return lr

    return schedule


def linear_decay(base_lr: float, total_steps: int, min_ratio: float = 0.0):
    def schedule(step):
        frac = jnp.clip(step / total_steps, 0.0, 1.0)
        return base_lr * (1 - (1 - min_ratio) * frac)

    return schedule
