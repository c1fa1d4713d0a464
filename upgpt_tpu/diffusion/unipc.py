"""UniPC (order-2, bh2, data prediction): predictor-corrector sampler,
one `lax.scan`, one model eval per step.

Beyond-parity addition (the reference ships DDIM/PLMS only,
ldm/models/diffusion/ddim.py + plms.py; we add DPM-Solver++(2M) and this).
UniPC (Zhao et al. 2023, arXiv:2302.04867 — the public formulation used by
diffusers' UniPCMultistepScheduler) upgrades a p-order multistep predictor
with a (p+1)-order corrector at ZERO extra model evals: the model output
computed at the freshly predicted point — which the next predictor step
needs anyway — also corrects that point before it becomes the state.
Measured on this model family (benchmarks/sampler_quality.py, full
geometry, docs/PERF.md round 4): UniPC-10 agrees with the DDIM-200
trajectory as closely as DPM++-10 (0.9865 MS-SSIM; DPM++-20: 0.9936) —
i.e. 10-step sampling at zero corrector cost, not a free ride to 20-step
quality on this (overfit-model) protocol; the real-weights FID comparison
is the bringup runbook's eval stage.

TPU shape (same discipline as dpm_solver.py): every per-step solver
coefficient is precomputed host-side in float64 over the reference's
uniform DDIM t-grid and enters the scan as stacked f32 constants; the scan
carry holds (current uncorrected sample, two x0-history slots, the
corrector base). No data-dependent control flow.

Math (x0-prediction; lam = log(alpha/sigma), h_i = lam_{i+1} - lam_i > 0,
hh = -h, phi1 = expm1(hh), B_h = phi1 for the bh2 variant):

  base_i     = (sig_{i+1}/sig_i) x_i - alpha_{i+1} phi1 x0_i
  predictor  x~_{i+1} = base_i - alpha_{i+1} B_h rho_p D1_i,
             D1_i = (x0_{i-1} - x0_i)/r_i,  r_i = (lam_{i-1} - lam_i)/h_i,
             rho_p = (phi1/hh - 1)/B_h                       (order 2)
  corrector  (applied at step i+1, reusing its model eval)
             x_{i+1} = base_i - alpha_{i+1} B_h (c0 D1_i + c1 D1_t),
             D1_t = x0(x~_{i+1}) - x0_i,
             [c0, c1] solves [[1,1],[r_i,1]] c = [b1, b2],
             b1 = (phi1/hh - 1)/B_h, b2 = 2(phi1/hh - 1 - hh/2)/(hh B_h)

  With the D1 terms dropped (first step / terminal step) the predictor is
  exactly the DDIM eta=0 update (tested), as in dpm_solver.py.

The 1/r_i factors are folded into the stacked coefficients host-side, so
the device computes only x0 differences. CFG/x_T interface identical to
`ddim.ddim_sample`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from upgpt_tpu.diffusion.ddim import EpsModel, cfg_eps_model
from upgpt_tpu.diffusion.schedule import (
    DiffusionSchedule, make_ddim_timesteps, make_karras_timesteps,
)


@dataclasses.dataclass(frozen=True)
class UniPCSchedule:
    """Per-step tables, ordered by sampling step (reverse time).

    Step i's constants describe (a) the corrector for the i-1 -> i
    transition (applied at step i, where the fresh model eval lives) and
    (b) the predictor for i -> i+1.
    """

    timesteps: np.ndarray  # (S,) int32 descending — model-eval t per step
    alphas: np.ndarray     # acp at eval t (x0 conversion)
    # corrector of the PREVIOUS transition, applied this step:
    corr_hist: np.ndarray  # multiplies (x0_{i-2} - x0_{i-1})  [c0/r folded]
    corr_new: np.ndarray   # multiplies (x0(x~_i) - x0_{i-1})  [c1]
    # predictor of this transition:
    coef_x: np.ndarray     # sig_next/sig_cur
    coef_0: np.ndarray     # -alpha_next * phi1   (multiplies x0_i)
    pred_hist: np.ndarray  # multiplies (x0_{i-1} - x0_i)  [rho_p/r folded]

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def make_unipc_schedule(
    schedule: DiffusionSchedule,
    num_steps: int,
    method: str = "uniform",
) -> UniPCSchedule:
    """Order-2 bh2 UniPC tables over the reference DDIM t-grid, or the
    beyond-parity "karras" low-step grid (grid-generic table math)."""
    if method == "karras":
        ts = make_karras_timesteps(schedule, num_steps)
    else:
        ts = make_ddim_timesteps(method, num_steps, schedule.num_timesteps)
    acp = schedule.alphas_cumprod.astype(np.float64)
    a_cur = acp[ts]
    a_next = np.asarray([acp[0]] + acp[ts[:-1]].tolist())
    rev = slice(None, None, -1)
    a_cur, a_next, ts = a_cur[rev], a_next[rev], ts[rev]
    S = len(ts)

    alpha_c, sigma_c = np.sqrt(a_cur), np.sqrt(1.0 - a_cur)
    alpha_n, sigma_n = np.sqrt(a_next), np.sqrt(1.0 - a_next)
    lam_c = np.log(alpha_c / np.maximum(sigma_c, 1e-20))
    lam_n = np.log(alpha_n / np.maximum(sigma_n, 1e-20))
    h = lam_n - lam_c                      # (S,) > 0
    hh = -h
    phi1 = np.expm1(hh)
    B_h = phi1                             # bh2
    # b-vector of the order-2 system (see module docstring)
    b1 = (phi1 / hh - 1.0) / B_h
    b2 = 2.0 * (phi1 / hh - 1.0 - hh / 2.0) / (hh * B_h)

    coef_x = sigma_n / sigma_c
    coef_0 = -alpha_n * phi1

    # history spacing r_i = (lam_{i-1} - lam_i) / h_i; step 0 has none
    r = np.zeros(S)
    r[1:] = (lam_c[:-1] - lam_c[1:]) / h[1:]

    # predictor residual coefficient: -alpha_n * B_h * rho_p / r
    pred_hist = np.zeros(S)
    pred_hist[1:] = -alpha_n[1:] * B_h[1:] * b1[1:] / r[1:]

    # corrector of transition i (applied at step i+1): order 2 when
    # transition i has history (i >= 1), else the order-1 corrector
    # (c0 = 0, c1 = b1 — the 1x1 system).
    c0 = np.zeros(S)
    c1 = b1.copy()
    i2 = np.arange(S) >= 1
    denom = np.where(1.0 - r == 0.0, 1.0, 1.0 - r)
    c0 = np.where(i2, (b1 - b2) / denom, 0.0)
    c1 = np.where(i2, (b2 - r * b1) / denom, b1)
    corr_hist_t = np.zeros(S)  # c0/r folded; transition-indexed
    corr_hist_t[1:] = -alpha_n[1:] * B_h[1:] * c0[1:] / r[1:]
    corr_new_t = -alpha_n * B_h * c1

    # terminal guard (sigma_next ~ 0): force pure first-order, no corrector
    # into that transition — matches dpm_solver.py's guard.
    term = sigma_n <= 1e-10
    coef_0 = np.where(term, alpha_n, coef_0)
    pred_hist = np.where(term, 0.0, pred_hist)
    corr_hist_t = np.where(term, 0.0, corr_hist_t)
    corr_new_t = np.where(term, 0.0, corr_new_t)

    # shift transition-indexed corrector coefs to the step that APPLIES
    # them (step i applies transition i-1's corrector); step 0 applies none
    corr_hist = np.zeros(S)
    corr_new = np.zeros(S)
    corr_hist[1:] = corr_hist_t[:-1]
    corr_new[1:] = corr_new_t[:-1]

    f32 = lambda x: np.ascontiguousarray(x).astype(np.float32)  # noqa: E731
    return UniPCSchedule(
        timesteps=np.ascontiguousarray(ts).astype(np.int32),
        alphas=f32(a_cur), corr_hist=f32(corr_hist), corr_new=f32(corr_new),
        coef_x=f32(coef_x), coef_0=f32(coef_0), pred_hist=f32(pred_hist),
    )


def unipc_sample(
    eps_model: EpsModel,
    solver: UniPCSchedule,
    shape: Tuple[int, ...],
    cond: Dict[str, Any],
    key: jax.Array,
    *,
    x_T: Optional[jax.Array] = None,
    guidance_scale: float = 1.0,
    uncond: Optional[Dict[str, Any]] = None,
) -> jax.Array:
    """Run the UniPC-2 reverse process; returns z_0 (latent).

    Deterministic given x_T/key (ODE solver). CFG by batch-doubling,
    identical to `ddim_sample`. The final point is the last predictor
    output (its corrector would need one more model eval — same contract
    as diffusers' scheduler).
    """
    if x_T is None:
        key, k_init = jax.random.split(key)
        img = jax.random.normal(k_init, shape, jnp.float32)
    else:
        img = x_T.astype(jnp.float32)

    model_eps = cfg_eps_model(eps_model, cond, uncond, guidance_scale)
    b = shape[0]
    per_step = (
        jnp.asarray(solver.timesteps),
        jnp.asarray(solver.alphas),
        jnp.asarray(solver.corr_hist),
        jnp.asarray(solver.corr_new),
        jnp.asarray(solver.coef_x),
        jnp.asarray(solver.coef_0),
        jnp.asarray(solver.pred_hist),
    )

    def step(carry, consts):
        # x: current sample, uncorrected (model evals happen here);
        # x0_a / x0_b: x0 predictions one / two steps back;
        # base: corrector base of the transition that produced x
        x, x0_a, x0_b, base = carry
        t_scalar, a, ch, cn, cx, c0, ph = consts
        t_b = jnp.full((b,), t_scalar, jnp.int32)
        eps = model_eps(x, t_b).astype(jnp.float32)
        x0 = (x - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)
        # corrector for THIS point (no-op at step 0: base==x, ch==cn==0)
        x_corr = base + ch * (x0_b - x0_a) + cn * (x0 - x0_a)
        # predictor for the next point (ph==0 at step 0: first-order)
        base_next = cx * x_corr + c0 * x0
        x_next = base_next + ph * (x0_a - x0)
        return (x_next, x0, x0_a, base_next), None

    init = (img, jnp.zeros_like(img), jnp.zeros_like(img), img)
    (img, _, _, _), _ = jax.lax.scan(step, init, per_step, unroll=2)
    return img
