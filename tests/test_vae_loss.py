"""VAE GAN-loss tests: hinge math, gating, adaptive weight, disc updates."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from upgpt_tpu.models.vae import DiagonalGaussian
from upgpt_tpu.training.vae_loss import (
    LPIPSWithDiscriminator, NLayerDiscriminator, VAELossConfig,
    adopt_weight, hinge_d_loss, vanilla_d_loss,
)


def test_hinge_loss_values():
    real = jnp.asarray([2.0, 0.0])
    fake = jnp.asarray([-2.0, 0.0])
    # relu(1-2)=0, relu(1-0)=1 -> mean 0.5 ; relu(1-2)=0, relu(1+0)=1 -> 0.5
    assert float(hinge_d_loss(real, fake)) == pytest.approx(0.5)
    assert float(vanilla_d_loss(real, fake)) > 0


def test_adopt_weight_gating():
    assert float(adopt_weight(1.0, 10, threshold=100)) == 0.0
    assert float(adopt_weight(1.0, 100, threshold=100)) == 1.0


def _setup():
    loss = LPIPSWithDiscriminator(VAELossConfig(disc_start=5, kl_weight=1e-6))
    lp = loss.init_params(jax.random.PRNGKey(0), image_hw=(32, 32))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    xrec = jnp.clip(x + 0.1, -1, 1)
    moments = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    return loss, lp, x, xrec, DiagonalGaussian(moments)


def test_generator_loss_pre_and_post_gate():
    loss, lp, x, xrec, post = _setup()
    l0, log0 = loss.generator_loss(lp, x, xrec, post, global_step=0)
    l1, log1 = loss.generator_loss(lp, x, xrec, post, global_step=10)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    assert float(log0["disc_factor"]) == 0.0 and float(log1["disc_factor"]) == 1.0


def test_adaptive_weight_uses_last_layer_grads():
    loss, lp, x, xrec, post = _setup()

    # a fake last-layer grad fn: returns a scaled vector per scalar loss
    def grad_fn(scalar):
        return jnp.ones((8,)) * scalar

    _, log = loss.generator_loss(
        lp, x, xrec, post, global_step=10, last_layer_grad_fn=grad_fn
    )
    assert float(log["d_weight"]) > 0


def test_discriminator_step_and_stats_update():
    loss, lp, x, xrec, post = _setup()
    d, log = loss.discriminator_loss(lp, x, xrec, global_step=10)
    assert np.isfinite(float(d)) and float(d) > 0
    # batch stats changed
    old = jax.tree.leaves(lp["disc_stats"])
    new = jax.tree.leaves(log["new_disc_stats"])
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0 for a, b in zip(old, new)
    )


def test_discriminator_patch_output_shape():
    d = NLayerDiscriminator()
    x = jnp.zeros((1, 64, 64, 3))
    v = d.init(jax.random.PRNGKey(0), x, train=True)
    out = d.apply(v, x, train=False)
    # 70x70 PatchGAN on 64px input -> 6x6 logits map
    assert out.shape[0] == 1 and out.shape[-1] == 1 and out.shape[1] > 1
