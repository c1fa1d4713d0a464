"""First-stage VAE training: the two-optimizer GAN loop.

Reference behavior (ldm/models/autoencoder.py:285-423 training_step +
contperceptual loss): optimizer 0 updates encoder/decoder/quant convs with
rec+KL+adaptive-GAN loss; optimizer 1 updates the PatchGAN discriminator;
both AdamW at lr with betas (0.5, 0.9) (autoencoder.py configure_optimizers).

The adaptive discriminator weight needs d(nll)/d(last_layer) and
d(g_loss)/d(last_layer) (contperceptual.py:33-43): computed here as two
extra `jax.grad` passes over the generator params, taking the decoder
conv_out kernel leaf — then the total loss backprops with d_weight
stop-gradiented, all inside ONE jitted step per optimizer.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from upgpt_tpu.models.vae import AutoencoderKL
from upgpt_tpu.training.vae_loss import LPIPSWithDiscriminator


def make_vae_optimizers(learning_rate: float):
    """AdamW betas (0.5, 0.9) like the reference's Adam betas for both nets."""
    g = optax.adam(learning_rate, b1=0.5, b2=0.9)
    d = optax.adam(learning_rate, b1=0.5, b2=0.9)
    return g, d


def _last_layer_leaf(params_vae) -> jax.Array:
    return params_vae["decoder"]["conv_out"]["kernel"]


def generator_step(
    vae: AutoencoderKL,
    loss_mod: LPIPSWithDiscriminator,
    params_vae: Dict,
    loss_params: Dict,
    opt: optax.GradientTransformation,
    opt_state,
    batch_images: jax.Array,
    key: jax.Array,
    global_step,
) -> Tuple[Dict, Any, Dict, Dict]:
    """One generator (VAE) update; returns (params, opt_state, logvar', log)."""

    def forward(p):
        recons, posterior = vae.apply(
            {"params": p}, batch_images, key, sample_posterior=True
        )
        return recons, posterior

    # adaptive weight: grads of nll and g wrt the decoder's last kernel
    def nll_of(p):
        recons, _ = forward(p)
        rec = jnp.abs(batch_images - recons)
        if loss_mod.lpips_fn is not None:
            rec = rec + loss_mod.config.perceptual_weight * loss_mod.lpips_fn(
                batch_images, recons
            ).reshape(-1, 1, 1, 1)
        nll = rec / jnp.exp(loss_params["logvar"]) + loss_params["logvar"]
        return jnp.sum(nll) / nll.shape[0]

    def g_of(p):
        recons, _ = forward(p)
        logits = loss_mod.disc.apply(
            {"params": loss_params["disc"], "batch_stats": loss_params["disc_stats"]},
            recons, train=False,
        )
        return -jnp.mean(logits)

    nll_grad = _last_layer_leaf(jax.grad(nll_of)(params_vae))
    g_grad = _last_layer_leaf(jax.grad(g_of)(params_vae))
    d_weight = jnp.linalg.norm(nll_grad) / (jnp.linalg.norm(g_grad) + 1e-4)
    d_weight = jnp.clip(jax.lax.stop_gradient(d_weight), 0.0, 1e4)
    d_weight = d_weight * loss_mod.config.disc_weight

    def total_loss(p, logvar):
        recons, posterior = forward(p)
        lp = dict(loss_params)
        lp["logvar"] = logvar
        loss, log = loss_mod.generator_loss(
            lp, batch_images, recons, posterior, global_step,
            last_layer_grad_fn=None,
        )
        # replace the (zero) d_weight term with the computed adaptive weight
        from upgpt_tpu.training.vae_loss import adopt_weight

        disc_factor = adopt_weight(
            loss_mod.config.disc_factor, global_step, loss_mod.config.disc_start
        )
        loss = loss + d_weight * disc_factor * log["g_loss"]
        log["d_weight"] = d_weight
        return loss, log

    (loss, log), (grads_p, grad_logvar) = jax.value_and_grad(
        total_loss, argnums=(0, 1), has_aux=True
    )(params_vae, loss_params["logvar"])
    updates, opt_state = opt.update(grads_p, opt_state, params_vae)
    params_vae = optax.apply_updates(params_vae, updates)
    if loss_mod.config.learn_logvar:
        new_logvar = loss_params["logvar"] - 1e-4 * grad_logvar  # scalar SGD
    else:
        # reference default: logvar fixed at logvar_init, never optimized
        # (learn_logvar=False keeps it out of opt_ae, contperceptual.py:15-19)
        new_logvar = loss_params["logvar"]
    return params_vae, opt_state, new_logvar, log


def discriminator_step(
    vae: AutoencoderKL,
    loss_mod: LPIPSWithDiscriminator,
    params_vae: Dict,
    loss_params: Dict,
    opt: optax.GradientTransformation,
    opt_state,
    batch_images: jax.Array,
    key: jax.Array,
    global_step,
) -> Tuple[Dict, Any, Dict]:
    recons, _ = vae.apply(
        {"params": params_vae}, batch_images, key, sample_posterior=True
    )
    recons = jax.lax.stop_gradient(recons)

    def d_loss_fn(disc_params):
        lp = dict(loss_params)
        lp["disc"] = disc_params
        loss, log = loss_mod.discriminator_loss(
            lp, batch_images, recons, global_step
        )
        return loss, log

    (loss, log), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
        loss_params["disc"]
    )
    updates, opt_state = opt.update(grads, opt_state, loss_params["disc"])
    new_disc = optax.apply_updates(loss_params["disc"], updates)
    new_loss_params = dict(loss_params)
    new_loss_params["disc"] = new_disc
    new_loss_params["disc_stats"] = log.pop("new_disc_stats")
    return new_loss_params, opt_state, log


def vae_train_step(
    vae: AutoencoderKL,
    loss_mod: LPIPSWithDiscriminator,
    params_vae: Dict,
    loss_params: Dict,
    opts: Tuple[optax.GradientTransformation, optax.GradientTransformation],
    opt_states: Tuple[Any, Any],
    batch_images: jax.Array,
    key: jax.Array,
    global_step,
):
    """Alternating G/D update (Lightning's two-optimizer step)."""
    k_g, k_d = jax.random.split(key)
    g_opt, d_opt = opts
    g_state, d_state = opt_states
    params_vae, g_state, new_logvar, g_log = generator_step(
        vae, loss_mod, params_vae, loss_params, g_opt, g_state,
        batch_images, k_g, global_step,
    )
    loss_params = dict(loss_params)
    loss_params["logvar"] = new_logvar
    loss_params, d_state, d_log = discriminator_step(
        vae, loss_mod, params_vae, loss_params, d_opt, d_state,
        batch_images, k_d, global_step,
    )
    logs = {**{f"gen/{k}": v for k, v in g_log.items()},
            **{f"disc/{k}": v for k, v in d_log.items()}}
    return params_vae, loss_params, (g_state, d_state), logs
