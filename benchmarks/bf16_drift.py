"""bf16-vs-fp32 end-to-end drift of the full DDIM-50 sampler (VERDICT r2
item 2b): same weights, same x_T/noise draws, interp_256 full geometry,
measured on-chip. Reports per-pixel drift of the decoded [-1,1] images —
the number that bounds what bf16 serving can cost in FID terms.

Usage: python benchmarks/bf16_drift.py [batch] [steps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
    from upgpt_tpu.inference.pipeline import GenerationPipeline
    from upgpt_tpu.utils.diagnostics import cast_floating
    from upgpt_tpu.zoo import build_latent_diffusion

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    rng = np.random.default_rng(0)
    eb = {
        "text_emb": jnp.asarray(rng.normal(size=(batch, 77, 768)) * 0.3,
                                jnp.float32),
        "style_emb": jnp.asarray(rng.normal(size=(batch, 9, 768)) * 0.3,
                                 jnp.float32),
        "smpl": jnp.asarray(rng.normal(size=(batch, 1, 85)), jnp.float32),
        "person_mask": jnp.asarray(
            rng.choice([-1.0, -0.99215686], size=(batch, 32, 24, 1)),
            jnp.float32),
    }
    key = jax.random.PRNGKey(7)

    outs = {}
    on_tpu = jax.devices()[0].platform != "cpu"
    for dtype_name in ("float32", "bfloat16"):
        model = build_latent_diffusion(
            "interp_256", dtype=dtype_name,
            use_flash_attention=on_tpu and dtype_name == "bfloat16",
        )
        if dtype_name == "bfloat16":
            import dataclasses

            model.config = dataclasses.replace(
                model.config,
                unet=dataclasses.replace(
                    model.config.unet, use_fused_transformer=on_tpu,
                    use_fused_groupnorm=False),
            )
            model = LatentDiffusion(model.config)
        # SAME fp32 master weights both runs (bf16 run casts them once,
        # exactly like bench.py / serving)
        if "params32" not in outs:
            outs["params32"] = jax.jit(model.init_params)(jax.random.PRNGKey(0))
            jax.block_until_ready(outs["params32"])
        params = outs["params32"]
        if dtype_name == "bfloat16":
            params = cast_floating(params, jnp.bfloat16)
        pipe = GenerationPipeline(model, num_steps=steps, eta=1.0)
        t0 = time.perf_counter()
        # identical PRNG key => identical x_T and eta-noise draws; the only
        # difference between the runs is compute precision
        outs[dtype_name] = np.asarray(pipe.generate(params, eb, key))
        print(f"{dtype_name}: {time.perf_counter()-t0:.1f}s "
              f"(compile+run)", file=sys.stderr)

    a, b = outs["float32"], outs["bfloat16"]
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    # report in 8-bit LSBs of the [-1,1]->[0,255] output quantization —
    # the unit that decides whether saved JPEGs/PNGs differ
    lsb = 2.0 / 255.0
    print(f"bf16-vs-fp32 DDIM-{steps} drift over {batch} images:")
    print(f"  max |d|  = {d.max():.4f}  ({d.max()/lsb:.1f} x 8-bit LSB)")
    print(f"  mean |d| = {d.mean():.4f}  ({d.mean()/lsb:.2f} x 8-bit LSB)")
    print(f"  p99 |d|  = {np.percentile(d, 99):.4f}")
    from _ledger import record

    record("bf16_vs_fp32_sampler_drift_max", float(d.max()), "abs([-1,1])",
           steps=steps, batch=batch, mean=round(float(d.mean()), 5),
           p99=round(float(np.percentile(d, 99)), 5))


if __name__ == "__main__":
    main()
