"""Capture a jax.profiler trace of the training step (+ device-op summary).

Usage: python benchmarks/trace_train.py [batch] [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_pipeline import summarize_trace  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from upgpt_tpu.diffusion.latent_diffusion import (
        LatentDiffusion, LatentDiffusionConfig,
    )
    from upgpt_tpu.models.unet import UNetConfig
    from upgpt_tpu.models.vae import AutoencoderConfig
    from upgpt_tpu.training.train_state import create_train_state, train_step
    from upgpt_tpu.utils.diagnostics import profile_trace

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    logdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/trace_train"

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = LatentDiffusionConfig.interp_256(
        unet=UNetConfig.interp_256(
            dtype=dtype, use_flash_attention=on_tpu,
            use_fused_groupnorm=on_tpu, use_fused_transformer=on_tpu,
        ),
        vae=AutoencoderConfig.kl_f8(dtype=dtype, use_flash_attention=on_tpu),
    )
    model = LatentDiffusion(cfg)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    frozen = {"vae": params.pop("vae")}
    state = create_train_state(params, learning_rate=2e-6, use_ema=True)

    rng = np.random.default_rng(0)
    h, w = cfg.latent_size
    bt = {
        "image": jnp.asarray(rng.normal(size=(batch, 256, 192, 3)) * 0.3,
                             jnp.float32),
        "person_mask": jnp.asarray(
            rng.choice([-1.0, -0.99215686], size=(batch, h, w, 1)),
            jnp.float32),
        "text_emb": jnp.asarray(rng.normal(size=(batch, 77, 768)), jnp.float32),
        "style_emb": jnp.asarray(rng.normal(size=(batch, 9, 768)), jnp.float32),
        "smpl": jnp.asarray(rng.normal(size=(batch, 1, 85)), jnp.float32),
        "loss_w": jnp.ones((batch, h, w, 1), jnp.float32),
    }
    key = jax.random.PRNGKey(1)
    step_fn = jax.jit(
        lambda s: train_step(model, s, frozen, bt, key), donate_argnums=0)

    state, metrics = step_fn(state)  # compile
    np.asarray(metrics["loss"])
    with profile_trace(logdir):
        for _ in range(3):
            state, metrics = step_fn(state)
        np.asarray(metrics["loss"])
    summarize_trace(logdir)


if __name__ == "__main__":
    main()
