"""Per-step learning-rate schedules: gradual warmup into cosine / multi-step.

Reproduces the reference's scheduler composition
(`contrast/lr_scheduler.py:6-85`), which is stepped *every iteration*
(`main_pretrain.py:269`):

    t <= warmup_steps:
        lr(t) = base/multiplier * ((multiplier-1) * t/warmup_steps + 1)
    t >  warmup_steps (cosine):
        lr(t) = eta_min + (base-eta_min) * (1 + cos(pi*(t-warmup)/T_max)) / 2
        with T_max = (epochs - warmup_epoch) * steps_per_epoch, eta_min=1e-6
    t >  warmup_steps (multi-step):
        lr(t) = base * gamma^(#milestones <= t-warmup)

plus the linear batch-size scaling rule lr = bs*world/256 * base_lr
(`main_pretrain.py:62,69`), applied by the caller via `scale_lr`.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

ETA_MIN = 1e-6


def scale_lr(base_lr: float, global_batch_size: int) -> float:
    """Linear LR scaling: lr = global_batch / 256 * base_lr."""
    return global_batch_size / 256.0 * base_lr


def warmup_cosine(base_lr: float, epochs: int, warmup_epoch: int,
                  steps_per_epoch: int, warmup_multiplier: float = 100.0):
    warmup_steps = warmup_epoch * steps_per_epoch
    t_max = max((epochs - warmup_epoch) * steps_per_epoch, 1)

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            warm = base_lr / warmup_multiplier * (
                (warmup_multiplier - 1.0) * t / warmup_steps + 1.0)
        else:
            warm = jnp.full_like(t, base_lr)
        cos = ETA_MIN + (base_lr - ETA_MIN) * (
            1.0 + jnp.cos(jnp.pi * (t - warmup_steps) / t_max)) / 2.0
        return jnp.where(t <= warmup_steps, warm, cos)

    return schedule


def warmup_multistep(base_lr: float, warmup_epoch: int, steps_per_epoch: int,
                     decay_epochs: Sequence[int], decay_rate: float = 0.1,
                     warmup_multiplier: float = 100.0):
    warmup_steps = warmup_epoch * steps_per_epoch
    milestones = jnp.asarray(
        [(m - warmup_epoch) * steps_per_epoch for m in decay_epochs],
        jnp.float32)

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        if warmup_steps > 0:
            warm = base_lr / warmup_multiplier * (
                (warmup_multiplier - 1.0) * t / warmup_steps + 1.0)
        else:
            warm = jnp.full_like(t, base_lr)
        n_decays = jnp.sum((t - warmup_steps) >= milestones)
        stepped = base_lr * decay_rate ** n_decays
        return jnp.where(t <= warmup_steps, warm, stepped)

    return schedule


def make_lr_schedule(lr_scheduler: str, base_lr: float, epochs: int,
                     warmup_epoch: int, steps_per_epoch: int,
                     warmup_multiplier: float = 100.0,
                     decay_epochs: Sequence[int] = (120, 160, 200),
                     decay_rate: float = 0.1):
    """Factory mirroring reference `get_scheduler` (`lr_scheduler.py:65-85`)."""
    if "cosine" in lr_scheduler:
        return warmup_cosine(base_lr, epochs, warmup_epoch, steps_per_epoch,
                             warmup_multiplier)
    if "step" in lr_scheduler:
        return warmup_multistep(base_lr, warmup_epoch, steps_per_epoch,
                                decay_epochs, decay_rate, warmup_multiplier)
    raise NotImplementedError(f"scheduler '{lr_scheduler}' not supported")
