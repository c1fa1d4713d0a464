"""DPM-Solver++(2M) correctness: first-order steps ARE DDIM eta=0, and the
second-order multistep tracks the fine-grid probability-flow ODE solution
far better than DDIM at equal step count (the whole point of the solver).
"""

import numpy as np
import jax
import jax.numpy as jnp

from upgpt_tpu.diffusion.ddim import ddim_sample
from upgpt_tpu.diffusion.dpm_solver import (
    dpm_solver_pp_sample, make_dpm_solver_schedule,
)
from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.diffusion.schedule import make_ddim_schedule

from test_latent_diffusion import tiny_batch, tiny_config


def _setup():
    model = LatentDiffusion(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    batch = tiny_batch(b=2)
    context = model.build_context(
        params, batch["text_emb"], batch["style_emb"], batch["smpl"])
    cond = {"c_crossattn": context, "c_concat": batch["person_mask"]}

    def eps_model(x, t, c):
        return model.apply_model(params, x, t, c)

    shape = (2, 8, 8, 4)
    x_T = jax.random.normal(jax.random.PRNGKey(7), shape, jnp.float32)
    return model, eps_model, cond, shape, x_T


def _run_ddim(model, eps_model, cond, shape, x_T, steps):
    ddim = make_ddim_schedule(model.schedule, steps, eta=0.0)
    return np.asarray(ddim_sample(
        eps_model, model.schedule, ddim, shape, cond,
        jax.random.PRNGKey(0), x_T=x_T))


def _run_dpm(model, eps_model, cond, shape, x_T, steps):
    solver = make_dpm_solver_schedule(model.schedule, steps)
    return np.asarray(dpm_solver_pp_sample(
        eps_model, solver, shape, cond, jax.random.PRNGKey(0), x_T=x_T))


def test_single_step_equals_ddim_eta0():
    """With one step the solver is first-order, which is exactly DDIM eta=0."""
    model, eps_model, cond, shape, x_T = _setup()
    d = _run_ddim(model, eps_model, cond, shape, x_T, 1)
    s = _run_dpm(model, eps_model, cond, shape, x_T, 1)
    np.testing.assert_allclose(s, d, atol=2e-5, rtol=1e-5)


def test_tracks_fine_ode_better_than_ddim():
    """At 10 steps, DPM++(2M) must land closer to the 50-step DDIM solution
    than 10-step DDIM does (2nd vs 1st order convergence), and be close in
    absolute terms. (The tiny schedule has 100 train timesteps, so 50 is
    the finest uniform DDIM grid.)"""
    model, eps_model, cond, shape, x_T = _setup()
    ref = _run_ddim(model, eps_model, cond, shape, x_T, 50)
    ddim10 = _run_ddim(model, eps_model, cond, shape, x_T, 10)
    dpm10 = _run_dpm(model, eps_model, cond, shape, x_T, 10)

    err_ddim = float(np.abs(ddim10 - ref).mean())
    err_dpm = float(np.abs(dpm10 - ref).mean())
    assert np.isfinite(err_dpm)
    assert err_dpm < err_ddim, (err_dpm, err_ddim)
    # absolute closeness relative to signal scale
    scale = float(np.abs(ref).mean())
    assert err_dpm < 0.25 * scale, (err_dpm, scale)


def test_matches_independent_numpy_reference():
    """Full trajectory vs a from-scratch numpy DPM-Solver++(2M) written
    straight from the paper's update rule (arXiv:2211.01095, data-prediction
    multistep) — derives lambda/h/c from alphas_cumprod independently of
    `make_dpm_solver_schedule`'s precomputed tables, so a sign, pairing, or
    ordering mistake in the tables cannot self-validate."""
    from upgpt_tpu.diffusion.schedule import make_ddim_timesteps

    model, _, _, shape, x_T = _setup()
    steps = 7

    # analytic eps-model: linear in x with a t-dependent bias — nontrivial
    # dynamics, no network weights involved
    wt = 0.3

    def eps_model(x, t, c):
        return wt * x + (t.astype(jnp.float32) / 100.0)[:, None, None, None]

    out = np.asarray(dpm_solver_pp_sample(
        eps_model, make_dpm_solver_schedule(model.schedule, steps),
        shape, cond={}, key=jax.random.PRNGKey(0), x_T=x_T))

    # ---- independent numpy reimplementation ----
    acp = model.schedule.alphas_cumprod.astype(np.float64)
    ts = make_ddim_timesteps("uniform", steps, model.schedule.num_timesteps)
    t_cur = ts[::-1]                                # descending eval times
    a_cur = acp[t_cur]
    # step i evaluates at t_cur[i] and lands on the grid point below it;
    # the terminal step lands on acp[0] (alphas_prev base, util.py:63-74)
    a_next = np.concatenate([acp[ts[:-1]][::-1], [acp[0]]])

    x = np.asarray(x_T, np.float64)
    x0_prev, h_prev = None, None
    for i in range(len(t_cur)):  # the uniform grid has num_steps+1 points
        ac, an = a_cur[i], a_next[i]
        al_c, sg_c = np.sqrt(ac), np.sqrt(1 - ac)
        al_n, sg_n = np.sqrt(an), np.sqrt(1 - an)
        t_b = np.full((shape[0],), t_cur[i], np.float64)
        eps = wt * x + (t_b / 100.0)[:, None, None, None]
        x0 = (x - sg_c * eps) / al_c
        lam_c = np.log(al_c / sg_c)
        lam_n = np.log(al_n / max(sg_n, 1e-20))
        h = lam_n - lam_c
        if x0_prev is None or sg_n <= 1e-10:
            d = x0
        else:
            c = h / (2.0 * h_prev)
            d = (1 + c) * x0 - c * x0_prev
        if sg_n <= 1e-10:
            x = al_n * d
        else:
            x = (sg_n / sg_c) * x - al_n * np.expm1(-h) * d
        x0_prev, h_prev = x0, h

    np.testing.assert_allclose(out, x, atol=5e-4, rtol=5e-4)


def test_cfg_batch_doubling_and_pipeline_route():
    """CFG path runs, and GenerationPipeline(sampler='dpm++') produces
    decoded images of the right shape/range."""
    from upgpt_tpu.inference.pipeline import GenerationPipeline

    model, eps_model, cond, shape, x_T = _setup()
    solver = make_dpm_solver_schedule(model.schedule, 4)
    uncond = jax.tree.map(jnp.zeros_like, cond)
    out = dpm_solver_pp_sample(
        eps_model, solver, shape, cond, jax.random.PRNGKey(1),
        x_T=x_T, guidance_scale=3.0, uncond=uncond)
    assert out.shape == shape and np.isfinite(np.asarray(out)).all()

    params = model.init_params(jax.random.PRNGKey(0))
    batch = tiny_batch(b=2)
    pipe = GenerationPipeline(model, num_steps=4, sampler="dpm++")
    imgs = np.asarray(pipe.generate(params, batch, jax.random.PRNGKey(2)))
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(imgs).all() and imgs.min() >= -1.0 and imgs.max() <= 1.0
