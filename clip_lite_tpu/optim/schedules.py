"""Warmup + decay LR multiplier schedules.

Pure ``step -> multiplier`` functions matching the reference's four
LambdaLR schedules (reference: optim/lr_scheduler.py:9-202).  The torch
convention is preserved: the i-th optimizer step (1-indexed) uses
multiplier f(i-1), i.e. the very first step runs at LR 0 during warmup —
which is exactly what ``optax.scale_by_schedule`` does with its 0-based
counter.

All four are also jit-traceable (jnp ops on traced step values) so they
can live inside the compiled update.
"""

from __future__ import annotations

import math
from typing import Callable, List, Sequence

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def linear_warmup_no_decay(total_steps: int, warmup_steps: int) -> Schedule:
    """Linear warmup, then constant (reference: lr_scheduler.py:9-45)."""
    assert warmup_steps < total_steps, "Warmup steps must be < total steps."

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        mult = jnp.where(step < warmup_steps,
                         step / max(1, warmup_steps), 1.0)
        return jnp.maximum(0.0, mult)

    return fn


def linear_warmup_multistep(total_steps: int, warmup_steps: int,
                            milestones: Sequence[int],
                            gamma: float = 0.1) -> Schedule:
    """Linear warmup, then step decay by gamma at each milestone
    (reference: lr_scheduler.py:48-108)."""
    milestones = list(milestones)
    assert milestones == sorted(milestones), "milestones must be increasing"
    assert milestones[0] > warmup_steps, "first milestone must be after warmup"
    assert milestones[-1] < total_steps, "last milestone must be < total steps"
    ms = jnp.asarray(milestones)

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, warmup_steps)
        n_passed = jnp.sum(step >= ms)  # bisect_right over milestones
        decay = gamma ** n_passed.astype(jnp.float32)
        return jnp.maximum(0.0, jnp.where(step < warmup_steps, warm, decay))

    return fn


def linear_warmup_linear_decay(total_steps: int, warmup_steps: int) -> Schedule:
    """Linear warmup, then linear decay to zero
    (reference: lr_scheduler.py:111-152)."""
    assert warmup_steps < total_steps, "Warmup steps must be < total steps."

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, warmup_steps)
        decay = (total_steps - step) / (total_steps - warmup_steps)
        return jnp.maximum(0.0, jnp.where(step < warmup_steps, warm, decay))

    return fn


def linear_warmup_cosine(total_steps: int, warmup_steps: int,
                         min_mult: float = 0.0) -> Schedule:
    """Linear warmup, then cos^2 decay with a floor
    (reference: lr_scheduler.py:155-202):
        mult = min_mult + cos^2((step - w) / (T - w) * pi/2)
    """
    assert warmup_steps < total_steps, "Warmup steps must be < total steps."

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, warmup_steps)
        cos_factor = (step - warmup_steps) / (total_steps - warmup_steps)
        decay = jnp.cos(cos_factor * (math.pi / 2)) ** 2
        mult = jnp.where(step < warmup_steps, warm, min_mult + decay)
        return jnp.maximum(0.0, mult)

    return fn


SCHEDULES = {
    "none": linear_warmup_no_decay,
    "multistep": linear_warmup_multistep,
    "linear": linear_warmup_linear_decay,
    "cosine": linear_warmup_cosine,
}
