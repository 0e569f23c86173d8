"""LR schedules (reference: monai/optimizers/lr_scheduler.py:41-61) as optax schedules."""
from __future__ import annotations

import math

import optax

__all__ = ["LinearLRSchedule", "ExponentialLRSchedule", "WarmupCosineSchedule"]


def LinearLRSchedule(initial_lr: float, end_lr: float, num_iter: int):
    """Linearly interpolated LR; reference ratio is step/(num_iter-1)
    (lr_scheduler.py:46)."""
    return optax.linear_schedule(init_value=initial_lr, end_value=end_lr,
                                 transition_steps=max(num_iter - 1, 1))


def ExponentialLRSchedule(initial_lr: float, end_lr: float, num_iter: int):
    """Exponentially interpolated LR: lr = init*(end/init)^(step/(num_iter-1))
    (reference: lr_scheduler.py:56)."""
    rate = (end_lr / initial_lr) ** (1.0 / max(num_iter - 1, 1))
    return optax.exponential_decay(init_value=initial_lr, transition_steps=1, decay_rate=rate)


def WarmupCosineSchedule(initial_lr: float, warmup_steps: int, t_total: int,
                         cycles: float = 0.5, end_lr: float = 0.0, warmup_multiplier: float = 0.0):
    """Linear warmup then cosine decay (reference: lr_scheduler.py:61)."""

    def schedule(step):
        import jax.numpy as jnp

        warm = jnp.maximum(warmup_steps, 1)
        lr_warm = initial_lr * (warmup_multiplier + (1 - warmup_multiplier) * (step / warm))
        progress = jnp.clip((step - warmup_steps) / jnp.maximum(t_total - warmup_steps, 1), 0.0, 1.0)
        lr_cos = end_lr + (initial_lr - end_lr) * 0.5 * (1.0 + jnp.cos(math.pi * cycles * 2.0 * progress))
        return jnp.where(step < warmup_steps, lr_warm, lr_cos)

    return schedule
