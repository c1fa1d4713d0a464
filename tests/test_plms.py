"""PLMS sampler parity vs the reference PLMSSampler on a shared mock model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from reference_loader import add_reference_to_path, reference_available
from upgpt_tpu.diffusion.schedule import DiffusionSchedule, make_ddim_schedule
from upgpt_tpu.diffusion.plms import plms_sample

from test_ddim import _TorchMockModel, _mock_eps_np


@pytest.mark.skipif(not reference_available(), reason="reference tree not present")
def test_plms_parity():
    add_reference_to_path()
    from ldm.models.diffusion.plms import PLMSSampler

    schedule = DiffusionSchedule.create(1000, linear_start=0.00085, linear_end=0.0120)
    tmodel = _TorchMockModel(schedule)
    sampler = PLMSSampler(tmodel)
    sampler.register_buffer = lambda name, attr: setattr(sampler, name, attr)
    sampler.make_schedule(ddim_num_steps=20, ddim_eta=0.0, verbose=False)

    rng = np.random.default_rng(0)
    x_T = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)

    with torch.no_grad():
        want, _ = sampler.plms_sampling(
            cond=None, shape=x_T.shape, x_T=torch.from_numpy(x_T),
            temperature=0.0, log_every_t=10**9,
        )
    want = want.numpy()

    ddim = make_ddim_schedule(schedule, 20, eta=0.0)

    def eps_model(x, t, cond):
        return 0.1 * x * jnp.cos(0.01 * t.astype(jnp.float32))[:, None, None, None] + 0.05

    got = plms_sample(
        eps_model, schedule, ddim, x_T.shape, {}, jax.random.PRNGKey(0),
        x_T=jnp.asarray(x_T),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_plms_rejects_eta():
    schedule = DiffusionSchedule.create(100, linear_start=0.00085, linear_end=0.0120)
    ddim = make_ddim_schedule(schedule, 5, eta=1.0)
    with pytest.raises(AssertionError):
        plms_sample(
            lambda x, t, c: x, schedule, ddim, (1, 2, 2, 3), {},
            jax.random.PRNGKey(0),
        )


def test_text_style_fusion_shapes():
    from upgpt_tpu.models.cond_fusion import TextStyleCrossAttention

    m = TextStyleCrossAttention(dim=64, num_heads=4, head_dim=16)
    t = jnp.zeros((2, 7, 64))
    s = jnp.zeros((2, 9, 64))
    params = m.init(jax.random.PRNGKey(0), t, s)["params"]
    out = m.apply({"params": params}, t, s)
    assert out.shape == (2, 7, 64)
