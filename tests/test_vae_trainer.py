"""Two-optimizer VAE GAN training step: runs jitted, updates both nets."""

import numpy as np
import jax
import jax.numpy as jnp

from upgpt_tpu.models.vae import AutoencoderConfig, AutoencoderKL
from upgpt_tpu.training.vae_loss import LPIPSWithDiscriminator, VAELossConfig
from upgpt_tpu.training.vae_trainer import make_vae_optimizers, vae_train_step


def test_vae_gan_train_step():
    cfg = AutoencoderConfig(embed_dim=4, z_channels=4, ch=32, ch_mult=(1, 2),
                            num_res_blocks=1, resolution=32)
    vae = AutoencoderKL(cfg)
    loss_mod = LPIPSWithDiscriminator(VAELossConfig(disc_start=0, disc_weight=0.5))

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    params = vae.init(key, x, key)["params"]
    loss_params = loss_mod.init_params(jax.random.PRNGKey(1), image_hw=(32, 32))
    opts = make_vae_optimizers(1e-4)
    opt_states = (opts[0].init(params), opts[1].init(loss_params["disc"]))

    step = jax.jit(lambda p, lp, os, b, k, s: vae_train_step(
        vae, loss_mod, p, lp, opts, os, b, k, s))
    p1, lp1, os1, logs = step(params, loss_params, opt_states, x, key, 1)

    assert np.isfinite(float(logs["gen/total_loss"]))
    assert np.isfinite(float(logs["disc/disc_loss"]))
    # generator params changed
    d = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                               - np.asarray(b, np.float32)).max()),
                     params, p1)
    assert max(jax.tree.leaves(d)) > 0
    # discriminator params changed
    d2 = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                                - np.asarray(b, np.float32)).max()),
                      loss_params["disc"], lp1["disc"])
    assert max(jax.tree.leaves(d2)) > 0
    # adaptive weight engaged (disc_start=0)
    assert float(logs["gen/d_weight"]) > 0
