"""Learning-rate schedules as optax-compatible functions.

Equivalents of the reference schedulers (basicsr/models/lr_scheduler.py):
MultiStepRestartLR, CosineAnnealingRestartLR, plus torch MultiStepLR and
the linear warmup of base_model.py:144-165.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def multi_step_lr(base_lr: float, milestones: Sequence[int],
                  gamma: float = 0.5):
    """lr * gamma^(#milestones passed) — torch MultiStepLR (stage-II
    config)."""
    ms = jnp.asarray(sorted(milestones))

    def schedule(step):
        n = jnp.sum(step >= ms)
        return base_lr * gamma ** n
    return schedule


def multi_step_restart_lr(base_lr: float, milestones: Sequence[int],
                          gamma: float = 0.5,
                          restarts: Sequence[int] = (0,),
                          restart_weights: Sequence[float] = (1,)):
    """lr_scheduler.py:6-53: MultiStep with restarts."""
    ms = sorted(milestones)
    restarts = list(restarts)
    weights = list(restart_weights)

    def schedule(step):
        lr = base_lr
        # restart weight applies at/after the latest restart
        w = 1.0
        for r, rw in zip(restarts, weights):
            w = jnp.where(step >= r, rw, w)
        n = jnp.sum(step >= jnp.asarray(ms)) if ms else 0
        return base_lr * w * gamma ** n
    return schedule


def cosine_annealing_restart_lr(base_lr: float, periods: Sequence[int],
                                restart_weights: Sequence[float] = (1,),
                                eta_min: float = 0.0):
    """lr_scheduler.py:57-96: cosine annealing with restarts.

    lr = eta_min + w * 0.5 * (base - eta_min) * (1 + cos(pi * t / T))
    where t is the position inside the current period.
    """
    assert len(periods) == len(restart_weights)
    cum = [0]
    for p in periods:
        cum.append(cum[-1] + p)

    def schedule(step):
        lr = eta_min + 0.0 * step
        for i, period in enumerate(periods):
            start, end = cum[i], cum[i + 1]
            inside = (step >= start) & (step < end)
            t = jnp.clip(step - start, 0, period)
            val = eta_min + restart_weights[i] * 0.5 * \
                (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t / period))
            lr = jnp.where(inside, val, lr)
        # past the last period: stay at the final value
        t_last = periods[-1]
        last_val = eta_min + restart_weights[-1] * 0.5 * \
            (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * 1.0))
        lr = jnp.where(step >= cum[-1], last_val, lr)
        return lr
    return schedule


def with_warmup(schedule, warmup_iter: int, base_lr: float):
    """Linear warmup from 0 (base_model.py:144-165). warmup_iter<=0: off."""
    if warmup_iter is None or warmup_iter <= 0:
        return schedule

    def warmed(step):
        warm = base_lr * (step + 1) / warmup_iter
        return jnp.where(step < warmup_iter, warm, schedule(step))
    return warmed


def build_schedule(train_opt: dict, base_lr: float):
    """From a YAML `scheduler:` block (options/*.yml)."""
    sched = dict(train_opt.get('scheduler') or {})
    stype = sched.pop('type', None)
    if stype is None:
        fn = lambda step: base_lr  # noqa: E731
    elif stype == 'MultiStepLR':
        fn = multi_step_lr(base_lr, sched['milestones'],
                           sched.get('gamma', 0.1))
    elif stype == 'MultiStepRestartLR':
        fn = multi_step_restart_lr(
            base_lr, sched['milestones'], sched.get('gamma', 0.1),
            sched.get('restarts', (0,)), sched.get('restart_weights', (1,)))
    elif stype == 'CosineAnnealingRestartLR':
        fn = cosine_annealing_restart_lr(
            base_lr, sched['periods'], sched.get('restart_weights', (1,)),
            sched.get('eta_min', 0.0))
    else:
        raise NotImplementedError(f'scheduler {stype}')
    return with_warmup(fn, train_opt.get('warmup_iter', -1), base_lr)
