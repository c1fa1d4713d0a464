"""Karras sigma spacing (beyond-parity t-grid for the low-step ODE solvers).

The grid itself is pinned by properties (ascending unique trained
timesteps, rho-warped density at low noise), and the solvers on the karras
grid are checked against the SAME independent numpy references the uniform
grid is (grid-parameterized) — the table math must be grid-generic, so a
pairing or ordering mistake that only shows on a non-uniform grid cannot
self-validate.
"""

import numpy as np
import jax
import jax.numpy as jnp

from upgpt_tpu.diffusion.ddim import ddim_sample
from upgpt_tpu.diffusion.dpm_solver import (
    dpm_solver_pp_sample, make_dpm_solver_schedule,
)
from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.diffusion.schedule import (
    DiffusionSchedule, make_ddim_schedule, make_karras_timesteps,
)
from upgpt_tpu.diffusion.unipc import make_unipc_schedule, unipc_sample

from test_latent_diffusion import tiny_batch, tiny_config


def _flagship_schedule():
    # the released models' schedule (interp_256/config.yaml:5-9)
    return DiffusionSchedule.create(
        timesteps=1000, beta_schedule="linear",
        linear_start=0.00085, linear_end=0.012)


def test_grid_properties():
    sched = _flagship_schedule()
    for steps in (5, 10, 20, 50):
        ts = make_karras_timesteps(sched, steps)
        assert ts.ndim == 1 and len(ts) == steps  # no collisions at these S
        assert (np.diff(ts) > 0).all()
        assert ts[0] >= 1 and ts[-1] <= sched.num_timesteps - 1
        # endpoints pin to the trained range: sigma_min at t=1, sigma_max
        assert ts[0] == 1
        assert ts[-1] == sched.num_timesteps - 1
    # rho-warping: densest at LOW noise (low t for VP), coarser mid-grid
    # than the uniform spacing
    gaps = np.diff(make_karras_timesteps(sched, 10))
    assert gaps[0] == gaps.min(), gaps
    assert gaps.max() > sched.num_timesteps // 10, gaps


def test_grid_single_step_and_monotone_sigma():
    sched = _flagship_schedule()
    ts1 = make_karras_timesteps(sched, 1)
    assert list(ts1) == [sched.num_timesteps - 1]
    # quantization preserves strict sigma ordering along the grid
    ts = make_karras_timesteps(sched, 25)
    acp = sched.alphas_cumprod.astype(np.float64)[ts]
    sig = np.sqrt((1 - acp) / acp)
    assert (np.diff(sig) > 0).all()


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


def _numpy_dpmpp(model, ts, x_T, shape, wt):
    """Grid-parameterized copy of test_dpm_solver's independent reference."""
    acp = model.schedule.alphas_cumprod.astype(np.float64)
    t_cur = ts[::-1]
    a_cur = acp[t_cur]
    a_next = np.concatenate([acp[ts[:-1]][::-1], [acp[0]]])
    x = np.asarray(x_T, np.float64)
    x0_prev, h_prev = None, None
    for i in range(len(t_cur)):
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
    return x


def test_dpmpp_karras_matches_numpy_reference():
    model, _, _, shape, x_T = _setup()
    wt = 0.3

    def eps_model(x, t, c):
        return wt * x + (t.astype(jnp.float32) / 100.0)[:, None, None, None]

    solver = make_dpm_solver_schedule(model.schedule, 9, method="karras")
    ts = make_karras_timesteps(model.schedule, 9)
    assert list(solver.timesteps) == list(ts[::-1])  # tables on the new grid
    out = np.asarray(dpm_solver_pp_sample(
        eps_model, solver, shape, cond={}, key=jax.random.PRNGKey(0),
        x_T=x_T))
    ref = _numpy_dpmpp(model, ts, x_T, shape, wt)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=5e-4)


def test_unipc_karras_runs_and_tracks_fine_ode():
    """UniPC on the karras grid stays a consistent ODE solver: it lands
    near the fine-grid DDIM solution (both integrate the same ODE), at
    least as close as 10-step uniform DDIM does."""
    model, eps_model, cond, shape, x_T = _setup()
    ref = np.asarray(ddim_sample(
        eps_model, model.schedule,
        make_ddim_schedule(model.schedule, 50, eta=0.0), shape, cond,
        jax.random.PRNGKey(0), x_T=x_T))
    uni_k = np.asarray(unipc_sample(
        eps_model, make_unipc_schedule(model.schedule, 10, method="karras"),
        shape, cond, jax.random.PRNGKey(0), x_T=x_T))
    ddim_u10 = np.asarray(ddim_sample(
        eps_model, model.schedule,
        make_ddim_schedule(model.schedule, 10, eta=0.0), shape, cond,
        jax.random.PRNGKey(0), x_T=x_T))
    err_k = float(np.abs(uni_k - ref).mean())
    err_d = float(np.abs(ddim_u10 - ref).mean())
    assert np.isfinite(err_k)
    assert err_k < err_d, (err_k, err_d)


def test_pipeline_schedule_method_route():
    from upgpt_tpu.inference.pipeline import GenerationPipeline

    model = LatentDiffusion(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    batch = tiny_batch(b=2)
    pipe = GenerationPipeline(
        model, num_steps=6, sampler="unipc", schedule_method="karras")
    assert pipe.unipc.num_steps == 6
    out = np.asarray(pipe.generate(params, batch, jax.random.PRNGKey(1)))
    assert out.shape[0] == 2 and np.isfinite(out).all()
    # DDIM + karras + progressive rows: idx built from the ACTUAL table
    pipe_d = GenerationPipeline(
        model, num_steps=6, eta=0.0, schedule_method="karras")
    imgs, prog = pipe_d.generate_progressive(
        params, batch, jax.random.PRNGKey(1), n_frames=3)
    assert prog.shape[1] == 3 and np.isfinite(np.asarray(prog)).all()
