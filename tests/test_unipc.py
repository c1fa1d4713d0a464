"""UniPC-2 correctness: single-step IS DDIM eta=0, the predictor-corrector
tracks the fine-grid ODE better than both DDIM and DPM++(2M) at equal step
count, and the full trajectory matches an independent numpy UniPC written
straight from the published update rules (arXiv:2302.04867, bh2 / data
prediction) with the order-2 system solved by np.linalg.solve — so a sign,
shift, or folding mistake in the precomputed tables cannot self-validate.
"""

import numpy as np
import jax
import jax.numpy as jnp

from upgpt_tpu.diffusion.ddim import ddim_sample
from upgpt_tpu.diffusion.dpm_solver import (
    dpm_solver_pp_sample, make_dpm_solver_schedule,
)
from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.diffusion.schedule import make_ddim_schedule, make_ddim_timesteps
from upgpt_tpu.diffusion.unipc import make_unipc_schedule, unipc_sample

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


def _run_unipc(model, eps_model, cond, shape, x_T, steps):
    solver = make_unipc_schedule(model.schedule, steps)
    return np.asarray(unipc_sample(
        eps_model, solver, shape, cond, jax.random.PRNGKey(0), x_T=x_T))


def test_single_step_equals_ddim_eta0():
    """One step: no history, no corrector applied — exactly DDIM eta=0."""
    model, eps_model, cond, shape, x_T = _setup()
    d = _run_ddim(model, eps_model, cond, shape, x_T, 1)
    u = _run_unipc(model, eps_model, cond, shape, x_T, 1)
    np.testing.assert_allclose(u, d, atol=2e-5, rtol=1e-5)


def test_tracks_fine_ode_better_than_ddim_and_dpmpp():
    """At 10 steps UniPC-2 must land closer to the 50-step DDIM solution
    than 10-step DDIM (order), and at least match 10-step DPM++(2M)
    (the corrector is the whole point)."""
    model, eps_model, cond, shape, x_T = _setup()
    ref = _run_ddim(model, eps_model, cond, shape, x_T, 50)
    ddim10 = _run_ddim(model, eps_model, cond, shape, x_T, 10)
    dpm10 = np.asarray(dpm_solver_pp_sample(
        eps_model, make_dpm_solver_schedule(model.schedule, 10), shape,
        cond, jax.random.PRNGKey(0), x_T=x_T))
    uni10 = _run_unipc(model, eps_model, cond, shape, x_T, 10)

    err_ddim = float(np.abs(ddim10 - ref).mean())
    err_dpm = float(np.abs(dpm10 - ref).mean())
    err_uni = float(np.abs(uni10 - ref).mean())
    assert np.isfinite(err_uni)
    assert err_uni < err_ddim, (err_uni, err_ddim)
    # corrector >= multistep-only at the same order/steps (small slack:
    # both are ~0 on a near-linear eps field)
    assert err_uni <= err_dpm * 1.05, (err_uni, err_dpm)


def test_matches_independent_numpy_reference():
    """Full trajectory vs a from-scratch numpy UniPC-2 (bh2, x0-pred)
    following the published step order — convert at the uncorrected
    sample, correct with this step's model output, then predict — with
    the order-2 corrector system solved numerically."""
    model, _, _, shape, x_T = _setup()
    steps = 7
    wt = 0.3

    def eps_model(x, t, c):
        return wt * x + (t.astype(jnp.float32) / 100.0)[:, None, None, None]

    out = np.asarray(unipc_sample(
        eps_model, make_unipc_schedule(model.schedule, steps),
        shape, cond={}, key=jax.random.PRNGKey(0), x_T=x_T))

    # ---- independent numpy reimplementation ----
    acp = model.schedule.alphas_cumprod.astype(np.float64)
    ts = make_ddim_timesteps("uniform", steps, model.schedule.num_timesteps)
    t_cur = ts[::-1]
    a_cur = acp[t_cur]
    a_next = np.concatenate([acp[ts[:-1]][::-1], [acp[0]]])

    x = np.asarray(x_T, np.float64)
    hist_x0 = None          # x0 at the previous eval point
    lam_hist = None         # lambda at the point before the previous one
    pending = None          # corrector context of the previous transition
    for i in range(len(t_cur)):
        ac, an = a_cur[i], a_next[i]
        al_c, sg_c = np.sqrt(ac), np.sqrt(1 - ac)
        al_n, sg_n = np.sqrt(an), np.sqrt(1 - an)
        t_b = np.full((shape[0],), t_cur[i], np.float64)
        eps = wt * x + (t_b / 100.0)[:, None, None, None]
        x0 = (x - sg_c * eps) / al_c          # convert at UNCORRECTED x

        if pending is not None:
            (al_t, sg_t, sg_s0, hh_p, phi1_p, bh_p, b1_p, b2_p, r_p,
             x0_s0, x0_s1, last_sample) = pending
            x_t_ = (sg_t / sg_s0) * last_sample - al_t * phi1_p * x0_s0
            if x0_s1 is not None:
                rks = np.array([r_p, 1.0])
                R = np.vstack([rks ** 0, rks ** 1])
                rc = np.linalg.solve(R, np.array([b1_p, b2_p]))
                corr = (rc[0] * (x0_s1 - x0_s0) / r_p
                        + rc[1] * (x0 - x0_s0))
            else:
                corr = b1_p * (x0 - x0_s0)
            x = x_t_ - al_t * bh_p * corr     # corrected current sample

        lam_c = np.log(al_c / sg_c)
        lam_n = np.log(al_n / max(sg_n, 1e-20))
        h = lam_n - lam_c
        hh = -h
        phi1 = np.expm1(hh)
        bh = phi1
        b1 = (phi1 / hh - 1.0) / bh
        b2 = 2.0 * (phi1 / hh - 1.0 - hh / 2.0) / (hh * bh)

        base = (sg_n / sg_c) * x - al_n * phi1 * x0
        if hist_x0 is not None and sg_n > 1e-10:
            r = (lam_hist - lam_c) / h
            x_next = base - al_n * bh * b1 * (hist_x0 - x0) / r
        else:
            r = 0.0
            x_next = al_n * x0 if sg_n <= 1e-10 else base

        pending = None if sg_n <= 1e-10 else (
            al_n, sg_n, sg_c, hh, phi1, bh, b1, b2, r, x0, hist_x0, x)
        hist_x0, lam_hist = x0, lam_c
        x = x_next

    np.testing.assert_allclose(out, x, atol=5e-4, rtol=5e-4)


def test_cfg_batch_doubling_and_pipeline_route():
    """CFG path runs, and GenerationPipeline(sampler='unipc') produces
    decoded images of the right shape/range."""
    from upgpt_tpu.inference.pipeline import GenerationPipeline

    model, eps_model, cond, shape, x_T = _setup()
    solver = make_unipc_schedule(model.schedule, 4)
    uncond = jax.tree.map(jnp.zeros_like, cond)
    out = unipc_sample(
        eps_model, solver, shape, cond, jax.random.PRNGKey(1),
        x_T=x_T, guidance_scale=3.0, uncond=uncond)
    assert out.shape == shape and np.isfinite(np.asarray(out)).all()

    params = model.init_params(jax.random.PRNGKey(0))
    batch = tiny_batch(b=2)
    pipe = GenerationPipeline(model, num_steps=4, sampler="unipc")
    imgs = np.asarray(pipe.generate(params, batch, jax.random.PRNGKey(2)))
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(imgs).all() and imgs.min() >= -1.0 and imgs.max() <= 1.0
