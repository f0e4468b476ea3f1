"""Learning-rate schedules.

``cyclic_triangular`` matches torch ``CyclicLR(mode='triangular')`` as
configured by the reference (trail_01.py:220-224): lr ramps linearly
base->max over ``step_size_up`` optimizer steps, back down over the same,
repeating, stepped per *batch* (train_val_epoch.py:372-373).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def cyclic_triangular(base_lr: float, max_lr: float, step_size_up: int,
                      step_size_down: int | None = None) -> optax.Schedule:
    step_size_down = step_size_down or step_size_up
    cycle_len = step_size_up + step_size_down

    def schedule(count):
        pos = jnp.mod(count, cycle_len)
        up = pos / step_size_up
        down = 1.0 - (pos - step_size_up) / step_size_down
        frac = jnp.where(pos <= step_size_up, up, down)
        return base_lr + (max_lr - base_lr) * jnp.clip(frac, 0.0, 1.0)

    return schedule
