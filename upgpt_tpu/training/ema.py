"""Exponential moving average of a parameter pytree.

Matches LitEma's semantics (reference ldm/modules/ema.py:5-76): effective
decay = min(decay, (1 + n) / (10 + n)) with n the number of updates, and
shadow = shadow - (1 - decay) * (shadow - param). Evaluation swaps to EMA
weights (reference ema_scope, ddpm.py:179-192) — functional here: just pass
`ema.shadow` as the eval params, nothing to store/restore.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    shadow: Any  # pytree mirroring the trainable params
    num_updates: jax.Array  # int32 scalar
    decay: float


def ema_init(params: Any, decay: float = 0.9999) -> EmaState:
    return EmaState(
        # deep copy: aliasing the live param buffers would break jit buffer
        # donation (same buffer donated twice) and silently tie the shadow
        shadow=jax.tree.map(lambda x: jnp.array(x, copy=True), params),
        num_updates=jnp.zeros((), jnp.int32),
        decay=decay,
    )


def ema_decay(state: EmaState) -> jax.Array:
    n = state.num_updates.astype(jnp.float32)
    return jnp.minimum(state.decay, (1.0 + n) / (10.0 + n))


def ema_update(state: EmaState, params: Any) -> EmaState:
    n = state.num_updates + 1
    d = jnp.minimum(state.decay, (1.0 + n.astype(jnp.float32)) / (10.0 + n.astype(jnp.float32)))
    one_minus = 1.0 - d
    shadow = jax.tree.map(
        lambda s, p: s - one_minus * (s - p.astype(s.dtype)), state.shadow, params
    )
    return EmaState(shadow=shadow, num_updates=n, decay=state.decay)
