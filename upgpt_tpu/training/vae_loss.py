"""VAE training loss: L1 + LPIPS + KL + adaptive-weight PatchGAN hinge.

Functional re-design of the reference LPIPSWithDiscriminator
(ldm/modules/losses/contperceptual.py:7-110, taming NLayerDiscriminator):

- generator loss (optimizer 0): weighted_nll + kl_weight*kl +
  d_weight * disc_factor * g_loss, where
    rec = |x - xrec| (+ perceptual_weight * LPIPS)
    nll = rec / exp(logvar) + logvar  (logvar a learned scalar)
    d_weight = ||d nll/d last_layer|| / (||d g/d last_layer|| + 1e-4),
      clamped to [0, 1e4], times disc_weight — computed with jax.grad
      against the decoder's final conv kernel instead of torch autograd.
    disc_factor gates the GAN term on after `disc_start` steps.
- discriminator loss (optimizer 1): hinge (or vanilla) on real/fake logits.

The PatchGAN discriminator is the standard 70x70 NLayer stack: stride-2
4x4 convs, LeakyReLU(0.2), BatchNorm -> here GroupNorm(1)=LayerNorm-ish
per-channel InstanceNorm-free variant is NOT equivalent, so we use true
BatchNorm via flax (running stats threaded explicitly).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (taming's NLayerDiscriminator)."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1, name="conv_in")(x)
        x = nn.leaky_relu(x, 0.2)
        nf = self.ndf
        for i in range(1, self.n_layers + 1):
            nf = min(self.ndf * 2**i, self.ndf * 8)
            stride = 2 if i < self.n_layers else 1
            x = nn.Conv(nf, (4, 4), strides=(stride, stride), padding=1,
                        use_bias=False, name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1, name="conv_out")(x)


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    loss_real = jnp.mean(nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    return 0.5 * (
        jnp.mean(nn.softplus(-logits_real)) + jnp.mean(nn.softplus(logits_fake))
    )


def adopt_weight(weight: float, global_step, threshold: int = 0) -> jax.Array:
    return jnp.where(global_step < threshold, 0.0, weight)


@dataclasses.dataclass(frozen=True)
class VAELossConfig:
    disc_start: int = 50001
    kl_weight: float = 1e-6
    pixelloss_weight: float = 1.0
    perceptual_weight: float = 1.0
    disc_num_layers: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 0.5
    disc_loss: str = "hinge"
    logvar_init: float = 0.0
    # reference default learn_logvar=False (contperceptual.py:15): logvar is
    # a fixed scalar (0.0), excluded from the generator optimizer
    learn_logvar: bool = False


class LPIPSWithDiscriminator:
    """Functional two-optimizer VAE loss. `lpips_fn(a, b) -> (B,)` is
    optional (weights may be unavailable); without it the loss degrades to
    L1 + KL + GAN exactly as if perceptual_weight were 0."""

    def __init__(self, config: VAELossConfig, lpips_fn: Optional[Callable] = None):
        self.config = config
        self.disc = NLayerDiscriminator(n_layers=config.disc_num_layers)
        self.lpips_fn = lpips_fn
        self.d_loss = hinge_d_loss if config.disc_loss == "hinge" else vanilla_d_loss

    def init_params(self, key: jax.Array, image_hw=(64, 64)):
        x = jnp.zeros((1, *image_hw, 3))
        variables = self.disc.init(key, x, train=True)
        return {
            "disc": variables["params"],
            "disc_stats": variables.get("batch_stats", {}),
            "logvar": jnp.asarray(self.config.logvar_init, jnp.float32),
        }

    # ---- generator side ----

    def generator_loss(
        self,
        loss_params: Dict[str, Any],
        inputs: jax.Array,
        recons: jax.Array,
        posterior,
        global_step,
        last_layer_grad_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
        weights: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        cfg = self.config
        rec = jnp.abs(inputs - recons) * cfg.pixelloss_weight
        if self.lpips_fn is not None and cfg.perceptual_weight > 0:
            p = self.lpips_fn(inputs, recons).reshape(-1, 1, 1, 1)
            rec = rec + cfg.perceptual_weight * p
        logvar = loss_params["logvar"]
        nll = rec / jnp.exp(logvar) + logvar
        wnll = nll if weights is None else weights * nll
        weighted_nll = jnp.sum(wnll) / wnll.shape[0]
        nll_loss = jnp.sum(nll) / nll.shape[0]
        kl = jnp.sum(posterior.kl()) / inputs.shape[0]

        logits_fake = self.disc.apply(
            {"params": loss_params["disc"],
             "batch_stats": loss_params["disc_stats"]},
            recons, train=False,
        )
        g_loss = -jnp.mean(logits_fake)

        if last_layer_grad_fn is not None and cfg.disc_factor > 0:
            nll_g = last_layer_grad_fn(nll_loss)
            gan_g = last_layer_grad_fn(g_loss)
            d_weight = jnp.linalg.norm(nll_g) / (jnp.linalg.norm(gan_g) + 1e-4)
            d_weight = jnp.clip(jax.lax.stop_gradient(d_weight), 0.0, 1e4)
            d_weight = d_weight * cfg.disc_weight
        else:
            d_weight = jnp.asarray(0.0)

        disc_factor = adopt_weight(cfg.disc_factor, global_step, cfg.disc_start)
        loss = weighted_nll + cfg.kl_weight * kl + d_weight * disc_factor * g_loss
        log = {
            "total_loss": loss, "logvar": logvar, "kl_loss": kl,
            "nll_loss": nll_loss, "rec_loss": jnp.mean(rec),
            "d_weight": d_weight, "disc_factor": disc_factor, "g_loss": g_loss,
        }
        return loss, log

    # ---- discriminator side ----

    def discriminator_loss(
        self,
        loss_params: Dict[str, Any],
        inputs: jax.Array,
        recons: jax.Array,
        global_step,
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        cfg = self.config
        variables = {"params": loss_params["disc"],
                     "batch_stats": loss_params["disc_stats"]}
        inputs = jax.lax.stop_gradient(inputs)
        recons = jax.lax.stop_gradient(recons)
        logits_real, new_model_state = self.disc.apply(
            variables, inputs, train=True, mutable=["batch_stats"]
        )
        logits_fake, new_model_state = self.disc.apply(
            {"params": loss_params["disc"], **new_model_state},
            recons, train=True, mutable=["batch_stats"],
        )
        disc_factor = adopt_weight(cfg.disc_factor, global_step, cfg.disc_start)
        d_loss = disc_factor * self.d_loss(logits_real, logits_fake)
        log = {
            "disc_loss": d_loss,
            "logits_real": jnp.mean(logits_real),
            "logits_fake": jnp.mean(logits_fake),
            "new_disc_stats": new_model_state["batch_stats"],
        }
        return d_loss, log
