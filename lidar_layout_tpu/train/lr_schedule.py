"""LR schedules (parity: lidm/utils/lr_scheduler.py LambdaWarmUpCosine family),
as optax-compatible schedule functions."""
from __future__ import annotations

import math
from typing import Sequence

import numpy as np


def lambda_warmup_cosine(warm_up_steps: int, lr_min: float, lr_max: float,
                         lr_start: float, max_decay_steps: int):
    """LambdaWarmUpCosineScheduler (lr_scheduler.py:4-34): linear warmup from
    lr_start to lr_max, then cosine decay to lr_min. Returns f(step)->lr
    multiplier (the reference multiplies base_lr by this)."""

    def schedule(step):
        step = np.minimum(step, max_decay_steps)
        if warm_up_steps > 0:
            warm = lr_start + (lr_max - lr_start) * (step / max(warm_up_steps, 1))
        else:
            warm = lr_max
        t = (step - warm_up_steps) / max(max_decay_steps - warm_up_steps, 1)
        t = np.clip(t, 0.0, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + np.cos(t * np.pi))
        return np.where(step < warm_up_steps, warm, cos)

    return schedule


def lambda_linear(warm_up_steps: int, f_min: float, f_max: float,
                  f_start: float, cycle_lengths: int):
    """LambdaLinearScheduler: warmup then linear decay."""

    def schedule(step):
        if step < warm_up_steps:
            return f_start + (f_max - f_start) * step / max(warm_up_steps, 1)
        t = (step - warm_up_steps) / max(cycle_lengths - warm_up_steps, 1)
        return max(f_min, f_max + (f_min - f_max) * min(t, 1.0))

    return schedule


def lambda_warmup_cosine_optax(base_lr: float, warm_up_steps: int,
                               lr_min: float, lr_max: float, lr_start: float,
                               max_decay_steps: int):
    """Jit-traceable LambdaWarmUpCosine as an optax schedule: returns
    f(step) -> base_lr * multiplier, usable directly as the ``learning_rate``
    of ``optax.adamw`` (the reference attaches the lambda via LambdaLR,
    main.py:712-722 + lr_scheduler.py:4-34)."""
    import jax.numpy as jnp

    def schedule(step):
        step = jnp.minimum(step, max_decay_steps)
        warm = lr_start + (lr_max - lr_start) * step / max(warm_up_steps, 1)
        t = jnp.clip((step - warm_up_steps)
                     / max(max_decay_steps - warm_up_steps, 1), 0.0, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return base_lr * jnp.where(step < warm_up_steps, warm, cos)

    return schedule


def scale_lr(base_lr: float, batch_size: int, n_devices: int,
             accumulate: int = 1) -> float:
    """Reference LR scaling rule: accum x ngpu x bs x base_lr (main.py:718-722)."""
    return accumulate * n_devices * batch_size * base_lr
