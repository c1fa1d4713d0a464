"""DDIM sampler as a single `lax.scan` — the whole reverse process is one
XLA program (optionally fused with the VAE decode by the caller's jit).

Math matches the reference DDIMSampler exactly
(ldm/models/diffusion/ddim.py:25-54 make_schedule, 113-163 ddim_sampling,
166-204 p_sample_ddim):

    pred_x0 = (x - sqrt(1-a_t) * eps) / sqrt(a_t)
    dir_xt  = sqrt(1 - a_prev - sigma_t^2) * eps
    x_prev  = sqrt(a_prev) * pred_x0 + dir_xt + sigma_t * N(0,1) * temperature

Classifier-free guidance is implemented by batch-doubling (ddim.py:171-178).
NOTE the reference's released sampling never builds `unconditional_conditioning`
(its `log_images` swallows the guidance kwargs — ddpm.py:1380-1444), so parity
runs use `guidance_scale=1.0 / uncond=None`; real CFG is available here anyway.

Mask-inpaint blending (ddim.py:144-147) is supported via `inpaint_mask`/`x0`.

RNG: one key, split per step inside the scan via `jax.random.fold_in` — fully
deterministic given the key, no host round-trips.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from upgpt_tpu.diffusion.schedule import DDIMSchedule, DiffusionSchedule

# eps-model signature: (x, t, cond) -> eps
EpsModel = Callable[[jax.Array, jax.Array, Dict[str, Any]], jax.Array]


def cfg_eps_model(
    eps_model: EpsModel,
    cond: Dict[str, Any],
    uncond: Optional[Dict[str, Any]],
    guidance_scale: float,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Classifier-free-guidance batch-doubling wrapper (ddim.py:171-178).

    Shared by every sampler (DDIM/PLMS-style scans, DPM-Solver++) so a CFG
    change lands everywhere at once. With no uncond (or scale 1.0) it is a
    plain conditioned call.
    """
    use_cfg = uncond is not None and guidance_scale != 1.0

    def model_eps(x, t_b):
        if use_cfg:
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t_b, t_b], axis=0)
            c_in = jax.tree.map(
                lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond
            )
            out = eps_model(x_in, t_in, c_in)
            e_uncond, e_cond = jnp.split(out, 2, axis=0)
            return e_uncond + guidance_scale * (e_cond - e_uncond)
        return eps_model(x, t_b, cond)

    return model_eps


def ddim_sample(
    eps_model: EpsModel,
    schedule: DiffusionSchedule,
    ddim: DDIMSchedule,
    shape: Tuple[int, ...],
    cond: Dict[str, Any],
    key: jax.Array,
    *,
    x_T: Optional[jax.Array] = None,
    eta_noise_key: Optional[jax.Array] = None,
    temperature: float = 1.0,
    guidance_scale: float = 1.0,
    uncond: Optional[Dict[str, Any]] = None,
    inpaint_mask: Optional[jax.Array] = None,
    x0: Optional[jax.Array] = None,
    return_pred_x0: bool = False,
) -> jax.Array:
    """Run the full DDIM reverse process; returns z_0 (latent).

    `shape` is the NHWC latent shape (B, h, w, C). All tables enter the scan
    as stacked per-step constants, so the loop compiles to one fused while.

    `return_pred_x0=True` additionally returns the per-step x0 predictions
    stacked as (num_steps, B, h, w, C) — the reference's progressive
    denoise-row debug surface (ddpm.py:1395-1431 progressive_denoising /
    `log_every_t` intermediates), emitted as scan outputs so the program
    stays ONE fused loop (latent-rate, so 50 steps of intermediates cost
    ~5 MB at the flagship geometry).
    """
    if x_T is None:
        key, k_init = jax.random.split(key)
        img = jax.random.normal(k_init, shape, jnp.float32)
    else:
        img = x_T.astype(jnp.float32)

    model_eps = cfg_eps_model(eps_model, cond, uncond, guidance_scale)

    ts = jnp.asarray(ddim.timesteps)
    a_t = jnp.asarray(ddim.alphas)
    a_prev = jnp.asarray(ddim.alphas_prev)
    sqrt_oma = jnp.asarray(ddim.sqrt_one_minus_alphas)
    sigmas = jnp.asarray(ddim.sigmas)
    sqrt_acp = jnp.asarray(schedule.sqrt_alphas_cumprod)
    sqrt_omacp = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod)

    b = shape[0]
    stochastic = bool((ddim.sigmas != 0).any())

    def step(carry, per_step):
        x, k = carry
        i, t_scalar, at, ap, soma, sig = per_step
        t_b = jnp.full((b,), t_scalar, jnp.int32)

        if inpaint_mask is not None:
            # blend the known region back in at the current noise level
            k, k_q = jax.random.split(k)
            noise_q = jax.random.normal(k_q, x.shape, x.dtype)
            x_orig = sqrt_acp[t_b][:, None, None, None] * x0 + \
                sqrt_omacp[t_b][:, None, None, None] * noise_q
            x = x_orig * inpaint_mask + (1.0 - inpaint_mask) * x

        eps = model_eps(x, t_b).astype(jnp.float32)
        pred_x0 = (x - soma * eps) / jnp.sqrt(at)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - ap - sig**2, 0.0)) * eps
        if stochastic:
            k, k_n = jax.random.split(k)
            noise = sig * jax.random.normal(k_n, x.shape, x.dtype) * temperature
        else:
            noise = 0.0
        x_prev = jnp.sqrt(ap) * pred_x0 + dir_xt + noise
        return (x_prev, k), (pred_x0 if return_pred_x0 else None)

    n = ddim.num_steps
    per_step = (
        jnp.arange(n, dtype=jnp.int32), ts, a_t, a_prev, sqrt_oma, sigmas,
    )
    # unroll=2 shaves scan bookkeeping and lets XLA overlap adjacent steps'
    # epilogue/prologue; the body is ~7 ms so trace-size cost is negligible
    (img, _), inter = jax.lax.scan(step, (img, key), per_step, unroll=2)
    if return_pred_x0:
        return img, inter
    return img


def ddim_img2img(
    eps_model: EpsModel,
    schedule: DiffusionSchedule,
    ddim: DDIMSchedule,
    x0: jax.Array,
    cond: Dict[str, Any],
    key: jax.Array,
    *,
    strength: float = 0.75,
    guidance_scale: float = 1.0,
    uncond: Optional[Dict[str, Any]] = None,
) -> jax.Array:
    """img2img: encode x0 to t = strength*num_steps, then denoise back.

    The reference pairs stochastic_encode with DDIMSampler.decode
    (ddim.py:206-241); here the partial reverse pass is the same scan over a
    table suffix (static `strength` -> one compiled program per setting).
    """
    t_enc = max(1, min(int(strength * ddim.num_steps), ddim.num_steps))
    key, k_enc = jax.random.split(key)
    x_t = ddim_stochastic_encode(
        schedule, ddim, x0, jnp.full((x0.shape[0],), t_enc - 1, jnp.int32), k_enc
    )
    start = ddim.num_steps - t_enc  # reverse-ordered tables: run the suffix
    sub = DDIMSchedule(
        timesteps=ddim.timesteps[start:],
        alphas=ddim.alphas[start:],
        alphas_prev=ddim.alphas_prev[start:],
        sqrt_one_minus_alphas=ddim.sqrt_one_minus_alphas[start:],
        sigmas=ddim.sigmas[start:],
    )
    return ddim_sample(
        eps_model, schedule, sub, x0.shape, cond, key, x_T=x_t,
        guidance_scale=guidance_scale, uncond=uncond,
    )


def ddim_stochastic_encode(
    schedule: DiffusionSchedule,
    ddim: DDIMSchedule,
    x0: jax.Array,
    t_index: jax.Array,
    key: jax.Array,
    noise: Optional[jax.Array] = None,
) -> jax.Array:
    """img2img forward encode at DDIM step `t_index` (reference ddim.py:206-220).

    `t_index` indexes the DDIM sub-schedule in *forward* order (0 = cleanest),
    matching the reference's use of `ddim_alphas[t]`.
    """
    # tables are stored reverse-time; flip back to forward order
    a_fwd = jnp.asarray(ddim.alphas)[::-1]
    sqrt_a = jnp.sqrt(a_fwd)[t_index]
    sqrt_oma = jnp.asarray(ddim.sqrt_one_minus_alphas)[::-1][t_index]
    if noise is None:
        noise = jax.random.normal(key, x0.shape, x0.dtype)
    shape = (-1,) + (1,) * (x0.ndim - 1)
    return sqrt_a.reshape(shape) * x0 + sqrt_oma.reshape(shape) * noise
