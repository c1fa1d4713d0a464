"""Learning-rate multiplier schedules as optax-compatible callables.

Replicates the reference `LambdaLinearScheduler` / warmup-cosine variants
(ldm/lr_scheduler.py:4-97): per-step multiplier with linear warmup from
f_start to f_max over warm_up_steps, then linear interpolation toward f_min
across the cycle. Multi-cycle lists supported as in the reference. The UPGPT
configs use a single cycle with an effectively infinite length
(interp_256/config.yaml:32-38).

The returned schedule maps step -> multiplier; multiply by base LR via
optax.scale_by_schedule or bake base_lr in.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp


def lambda_linear_schedule(
    warm_up_steps: Sequence[int],
    f_min: Sequence[float],
    f_max: Sequence[float],
    f_start: Sequence[float],
    cycle_lengths: Sequence[int],
):
    """LambdaLinearScheduler (reference lr_scheduler.py:81-97)."""
    warm_up = np.asarray(warm_up_steps, np.float64)
    fmin = np.asarray(f_min, np.float64)
    fmax = np.asarray(f_max, np.float64)
    fstart = np.asarray(f_start, np.float64)
    lengths = np.asarray(cycle_lengths, np.float64)
    cum = np.concatenate([[0.0], np.cumsum(lengths)])

    def schedule(step):
        n = jnp.asarray(step, jnp.float32)
        # find cycle: last boundary <= n
        cycle = jnp.clip(
            jnp.sum(jnp.asarray(cum[1:], jnp.float32) <= n), 0, len(lengths) - 1
        )
        wu = jnp.asarray(warm_up, jnp.float32)[cycle]
        f0 = jnp.asarray(fstart, jnp.float32)[cycle]
        f1 = jnp.asarray(fmax, jnp.float32)[cycle]
        f2 = jnp.asarray(fmin, jnp.float32)[cycle]
        length = jnp.asarray(lengths, jnp.float32)[cycle]
        start = jnp.asarray(cum[:-1], jnp.float32)[cycle]
        n_c = n - start
        warm = f0 + (f1 - f0) / jnp.maximum(wu, 1.0) * n_c
        decay = f2 + (f1 - f2) * (1.0 - (n_c - wu) / jnp.maximum(length - wu, 1.0))
        return jnp.where(n_c < wu, warm, decay)

    return schedule


def lambda_warmup_cosine(
    warm_up_steps: int, lr_min: float, lr_max: float, lr_start: float, max_decay_steps: int
):
    """LambdaWarmUpCosineScheduler (reference lr_scheduler.py:4-33)."""

    def schedule(step):
        n = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) / max(warm_up_steps, 1) * n
        t = (n - warm_up_steps) / jnp.maximum(max_decay_steps - warm_up_steps, 1)
        t = jnp.clip(t, 0.0, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < warm_up_steps, warm, cos)

    return schedule
