"""Data-parallel training semantics on the 8-device virtual CPU mesh.

Validates the TPU-native replacement for Lightning DDP (SURVEY.md §2.2):
batch sharded over the `data` mesh axis, params replicated, jit-emitted
gradient reduction — and that the result matches a single-device run.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.parallel.mesh import batch_sharding, create_mesh, replicated_sharding, shard_batch, host_local_slice
from upgpt_tpu.training.train_state import create_train_state, eval_step, train_step
from upgpt_tpu.training.lr import lambda_linear_schedule

from test_latent_diffusion import tiny_batch, tiny_config, split_params


def _setup():
    model = LatentDiffusion(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    trainable, frozen = split_params(params)
    state = create_train_state(
        trainable, learning_rate=1e-4,
        scheduler=lambda_linear_schedule([2], [1.0], [1.0], [1e-6], [10**13]),
        use_ema=True,
    )
    return model, state, frozen


def test_train_step_runs_and_updates(eight_devices):
    model, state, frozen = _setup()
    batch = tiny_batch(b=8)
    rng = jax.random.PRNGKey(3)
    new_state, metrics = train_step(model, state, frozen, batch, rng)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # ema counter advanced and shadow moved toward params
    assert int(new_state.ema.num_updates) == 1
    changed = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.params["unet"], new_state.params["unet"],
    )
    assert max(jax.tree.leaves(changed)) > 0


def test_dp_sharded_matches_single_device(eight_devices):
    """Global-batch loss/update must be invariant to sharding over the mesh."""
    model, state, frozen = _setup()
    batch = tiny_batch(b=8)
    rng = jax.random.PRNGKey(3)

    # single device (everything on device 0)
    s1, m1 = jax.jit(lambda s, f, b: train_step(model, s, f, b, rng))(state, frozen, batch)

    # 8-way data parallel
    mesh = create_mesh((8, 1))
    bsh = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    sharded_batch = shard_batch(mesh, batch)
    state_r = jax.device_put(state, rep)
    frozen_r = jax.device_put(frozen, rep)

    step_fn = jax.jit(
        lambda s, f, b: train_step(model, s, f, b, rng),
        in_shardings=(rep, rep, bsh),
    )
    s8, m8 = step_fn(state_r, frozen_r, sharded_batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-4)
    d = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()),
        s1.params, s8.params,
    )
    assert max(jax.tree.leaves(d)) < 5e-5


def test_eval_step_reports_ema_pair(eight_devices):
    model, state, frozen = _setup()
    batch = tiny_batch(b=4)
    out = eval_step(model, state, frozen, batch, jax.random.PRNGKey(0))
    assert "loss_simple" in out and "loss_simple_ema" in out
    # fresh EMA shadow == params => identical losses
    np.testing.assert_allclose(float(out["loss_simple"]), float(out["loss_simple_ema"]), rtol=1e-6)


def test_host_local_slice():
    assert host_local_slice(16, 0, 4) == slice(0, 4)
    assert host_local_slice(16, 3, 4) == slice(12, 16)
