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
