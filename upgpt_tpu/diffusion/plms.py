"""PLMS (pseudo linear multistep) sampler as a single lax.scan.

Math matches the reference PLMSSampler (ldm/models/diffusion/plms.py:118-236):
Adams-Bashforth orders 2-4 over the eps history, with a pseudo improved-Euler
bootstrap on the first step (an extra model eval at t_next). eta must be 0
(the reference asserts ddim_eta=0 for PLMS, plms.py:24-26).

TPU design: the 4-deep eps history rides in the scan carry as a stacked
(4, B, h, w, C) buffer with a step counter selecting the multistep order via
`lax.switch` — constant shapes, one compiled program. t_next is precomputed
host-side exactly like the reference's `time_range[1:] + [0]` pairing.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from upgpt_tpu.diffusion.schedule import DDIMSchedule, DiffusionSchedule

EpsModel = Callable[[jax.Array, jax.Array, Dict[str, Any]], jax.Array]


def plms_sample(
    eps_model: EpsModel,
    schedule: DiffusionSchedule,
    ddim: DDIMSchedule,
    shape: Tuple[int, ...],
    cond: Dict[str, Any],
    key: jax.Array,
    *,
    x_T: Optional[jax.Array] = None,
    guidance_scale: float = 1.0,
    uncond: Optional[Dict[str, Any]] = None,
) -> jax.Array:
    """Run the full PLMS reverse process; returns z_0."""
    assert (ddim.sigmas == 0).all(), "PLMS requires eta=0 (reference plms.py:24-26)"
    if x_T is None:
        key, k_init = jax.random.split(key)
        img = jax.random.normal(k_init, shape, jnp.float32)
    else:
        img = x_T.astype(jnp.float32)

    use_cfg = uncond is not None and guidance_scale != 1.0

    def model_eps(x, t_b):
        if use_cfg:
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t_b, t_b], axis=0)
            c_in = jax.tree.map(
                lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond
            )
            out = eps_model(x_in, t_in, c_in)
            e_u, e_c = jnp.split(out, 2, axis=0)
            return e_u + guidance_scale * (e_c - e_u)
        return eps_model(x, t_b, cond)

    b = shape[0]
    ts = np.asarray(ddim.timesteps)  # reverse order
    # t_next pairing: next (smaller) timestep, 0 at the end (plms.py:141-147)
    ts_next = np.concatenate([ts[1:], [0]]).astype(np.int32)

    def x_prev_from(e_t, x, at, ap, soma):
        pred_x0 = (x - soma * e_t) / jnp.sqrt(at)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - ap, 0.0)) * e_t
        return jnp.sqrt(ap) * pred_x0 + dir_xt

    def step(carry, per_step):
        x, hist, count = carry  # hist: (4, B, h, w, C) newest at [0]
        i, t_scalar, t_next_scalar, at, ap, soma = per_step
        t_b = jnp.full((b,), t_scalar, jnp.int32)

        e_t = model_eps(x, t_b).astype(jnp.float32)

        def order1(_):
            # pseudo improved Euler: extra eval at t_next
            x_prev0 = x_prev_from(e_t, x, at, ap, soma)
            t_next_b = jnp.full((b,), t_next_scalar, jnp.int32)
            e_next = model_eps(x_prev0, t_next_b).astype(jnp.float32)
            return (e_t + e_next) / 2.0

        def order2(_):
            return (3.0 * e_t - hist[0]) / 2.0

        def order3(_):
            return (23.0 * e_t - 16.0 * hist[0] + 5.0 * hist[1]) / 12.0

        def order4(_):
            return (55.0 * e_t - 59.0 * hist[0] + 37.0 * hist[1] - 9.0 * hist[2]) / 24.0

        e_prime = jax.lax.switch(
            jnp.minimum(count, 3), [order1, order2, order3, order4], None
        )
        x_prev = x_prev_from(e_prime, x, at, ap, soma)
        new_hist = jnp.concatenate([e_t[None], hist[:-1]], axis=0)
        return (x_prev, new_hist, count + 1), None

    hist0 = jnp.zeros((4,) + tuple(shape), jnp.float32)
    per_step = (
        jnp.arange(ddim.num_steps, dtype=jnp.int32),
        jnp.asarray(ts), jnp.asarray(ts_next),
        jnp.asarray(ddim.alphas), jnp.asarray(ddim.alphas_prev),
        jnp.asarray(ddim.sqrt_one_minus_alphas),
    )
    (img, _, _), _ = jax.lax.scan(step, (img, hist0, jnp.zeros((), jnp.int32)), per_step)
    return img
