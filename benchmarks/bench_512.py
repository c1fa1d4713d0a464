"""512px-stage benchmarks: mm_512 direct sampling and the upscale stage.

Measures DDIM-50 + decode img/s at batch 8 for:
  - mm_512: 64x48 latent (T=3072 self-attention -> Pallas flash path)
  - upscale: 128x96x3 kl-f4 latent, lr-concat conditioning

Usage: python benchmarks/bench_512.py [mm_512|upscale] [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from upgpt_tpu import zoo
    from upgpt_tpu.inference.pipeline import GenerationPipeline
    from upgpt_tpu.utils.diagnostics import cast_floating

    variant = sys.argv[1] if len(sys.argv) > 1 else "mm_512"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = 50

    on_tpu = jax.devices()[0].platform != "cpu"
    model = zoo.build_latent_diffusion(
        variant, dtype="bfloat16" if on_tpu else "float32",
        use_flash_attention=on_tpu,
    )
    import dataclasses
    model.config = dataclasses.replace(
        model.config,
        unet=dataclasses.replace(
            model.config.unet, use_fused_groupnorm=on_tpu,
            use_fused_transformer=on_tpu,
        ),
    )
    from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
    model = LatentDiffusion(model.config)

    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    if on_tpu:
        params = cast_floating(params, jnp.bfloat16)
    pipe = GenerationPipeline(model, num_steps=steps, eta=1.0,
                              output_uint8=True)

    rng = np.random.default_rng(0)
    h, w = model.config.latent_size
    eb = {
        "text_emb": jnp.asarray(rng.normal(size=(batch, 77, 768)), jnp.float32),
        "style_emb": jnp.asarray(rng.normal(size=(batch, 9, 768)), jnp.float32),
    }
    if model.config.pose_input_dim:
        eb["smpl"] = jnp.asarray(rng.normal(size=(batch, 1, 85)), jnp.float32)
    concat_ch = model.config.unet.in_channels - model.config.latent_channels
    eb["person_mask"] = jnp.asarray(
        rng.normal(size=(batch, h, w, concat_ch)), jnp.float32)

    key = jax.random.PRNGKey(42)
    t0 = time.perf_counter()
    np.asarray(pipe.generate(params, eb, key))
    print(f"{variant}: compile+first {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    times = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(pipe.generate(params, eb, jax.random.fold_in(key, i)))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{variant} batch={batch} steps={steps}: best {best*1000:.1f} ms "
          f"(median {np.median(times)*1000:.1f}), {batch/best:.2f} img/s")


if __name__ == "__main__":
    main()
