"""Fused AdamW+EMA optimizer: exact parity with the optax chain.

The fused state (train_state.FusedTrainState) exists for traffic, not
semantics — it must match optax.adamw + LitEma bit-for-nearly-bit so the
trainer can switch it on without changing convergence (reference optimizer:
torch AdamW defaults, ddpm.py:1501-1538; LitEma ldm/modules/ema.py:5-76).
"""

import numpy as np
import jax
import jax.numpy as jnp

from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.training.lr import lambda_linear_schedule
from upgpt_tpu.training.train_state import (
    create_fused_train_state, create_train_state, train_step,
)

from test_latent_diffusion import tiny_config, tiny_batch, split_params


def _setup():
    model = LatentDiffusion(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    trainable, frozen = split_params(params)
    return model, trainable, frozen, tiny_batch(b=2)


def test_fused_matches_optax():
    model, trainable, frozen, batch = _setup()
    sched = lambda_linear_schedule([2], [1.0], [1.0], [1e-6], [100])
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)

    s_ref = create_train_state(copy(trainable), 1e-3, scheduler=sched,
                               use_ema=True, ema_decay=0.999)
    s_fused = create_fused_train_state(copy(trainable), 1e-3,
                                       scheduler=sched, use_ema=True,
                                       ema_decay=0.999)
    step = jax.jit(lambda s, bt, r: train_step(model, s, frozen, bt, r))
    rng = jax.random.PRNGKey(7)
    for _ in range(5):
        s_ref, m_ref = step(s_ref, batch, rng)
        s_fused, m_fused = step(s_fused, batch, rng)

    flat_r = jax.tree.leaves(s_ref.params)
    flat_f = jax.tree.leaves(s_fused.params)
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)
    for a, b in zip(jax.tree.leaves(s_ref.ema.shadow),
                    jax.tree.leaves(s_fused.ema.shadow)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)
    assert int(s_fused.step) == 5
    assert int(s_fused.ema.num_updates) == 5


def test_fused_bf16_moments_converge():
    """bf16 mu/nu/shadow (the traffic saver): the overfit loss must fall
    comparably to the f32 path — bf16 moment noise must not break Adam."""
    model, trainable, frozen, batch = _setup()
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)

    finals = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        s = create_fused_train_state(copy(trainable), 2e-3, use_ema=True,
                                     ema_decay=0.99, moment_dtype=dtype)
        step = jax.jit(lambda st, bt, r: train_step(model, st, frozen, bt, r),
                       donate_argnums=0)
        rng = jax.random.PRNGKey(3)
        losses = []
        for _ in range(120):
            s, m = step(s, batch, rng)
            losses.append(float(m["loss_simple"]))
        finals[name] = np.mean(losses[-10:])
        first = np.mean(losses[:10])
        assert finals[name] < 0.8 * first, (name, first, finals[name])
    # bf16 moments must not cost more than 30% of the f32 path's progress
    assert finals["bf16"] < finals["f32"] * 1.3 + 0.05, finals
    # and the stored moments really are bf16
    mu_leaf = jax.tree.leaves(s.opt_state["mu"])[0]
    assert mu_leaf.dtype == jnp.bfloat16


def test_fused_no_ema():
    model, trainable, frozen, batch = _setup()
    s = create_fused_train_state(trainable, 1e-3, use_ema=False)
    step = jax.jit(lambda st, bt, r: train_step(model, st, frozen, bt, r))
    s, m = step(s, batch, jax.random.PRNGKey(0))
    assert s.ema is None and int(s.step) == 1
    assert np.isfinite(float(m["loss"]))
