"""Schedule tables vs the reference's numpy/torch math (recomputed here)."""

import numpy as np

from upgpt_tpu.diffusion.schedule import (
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_schedule,
    make_ddim_timesteps,
)


def test_linear_betas_upgpt_config():
    """linear_start 0.00085, linear_end 0.0120 (interp_256/config.yaml:5-6)."""
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    assert betas.dtype == np.float64
    np.testing.assert_allclose(betas[0], 0.00085)
    np.testing.assert_allclose(betas[-1], 0.0120)
    # sqrt-space linspace: sqrt(betas) must be exactly linear
    d = np.diff(np.sqrt(betas))
    np.testing.assert_allclose(d, d[0], rtol=1e-10)


def test_schedule_identities():
    s = DiffusionSchedule.create(1000, linear_start=0.00085, linear_end=0.0120)
    acp = s.alphas_cumprod.astype(np.float64)
    np.testing.assert_allclose(s.sqrt_alphas_cumprod, np.sqrt(acp), rtol=3e-5)
    np.testing.assert_allclose(
        s.sqrt_one_minus_alphas_cumprod, np.sqrt(1 - acp), rtol=3e-5
    )
    np.testing.assert_allclose(s.alphas_cumprod_prev[0], 1.0)
    np.testing.assert_allclose(s.alphas_cumprod_prev[1:], s.alphas_cumprod[:-1])
    assert s.lvlb_weights[0] == s.lvlb_weights[1]
    assert np.isfinite(s.lvlb_weights).all()


def test_ddim_timesteps_plus_one_shift():
    """uniform subset is range(0, T, T//S) + 1 (reference util.py:46-60)."""
    ts = make_ddim_timesteps("uniform", 50, 1000)
    assert ts[0] == 1 and ts[1] == 21 and len(ts) == 50
    ts200 = make_ddim_timesteps("uniform", 200, 1000)
    assert ts200[0] == 1 and ts200[1] == 6 and len(ts200) == 200


def test_ddim_schedule_reverse_order_and_sigmas():
    s = DiffusionSchedule.create(1000, linear_start=0.00085, linear_end=0.0120)
    dd = make_ddim_schedule(s, 50, eta=0.0)
    assert dd.num_steps == 50
    # reverse-time order: first scan step is the largest timestep
    assert dd.timesteps[0] == 981 and dd.timesteps[-1] == 1
    assert (dd.sigmas == 0).all()
    # alphas_prev of the final step is alphas_cumprod[0]
    np.testing.assert_allclose(dd.alphas_prev[-1], s.alphas_cumprod[0])

    dd_eta = make_ddim_schedule(s, 50, eta=1.0)
    a, ap = dd_eta.alphas.astype(np.float64), dd_eta.alphas_prev.astype(np.float64)
    want = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(dd_eta.sigmas, want, rtol=3e-5)


def test_cosine_schedule():
    betas = make_beta_schedule("cosine", 100)
    assert (betas > 0).all() and (betas <= 0.999).all()
