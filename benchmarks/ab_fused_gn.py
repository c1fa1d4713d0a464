"""Same-process interleaved A/B: fused GroupNorm kernel at the 512px
sampling geometry.

At 256px the fused GN+SiLU Pallas kernel was a measured REGRESSION in the
sampling loop (layout copies around the kernel; docs/PERF.md round 3) and
defaults OFF. The mm_512 trace (round 4) shows GroupNorm f32 statistics at
8.4% of device time at 512px — 4x the spatial area changes the
bytes-per-block ratio, so the 256px verdict does not transfer
automatically. Cross-process comparisons are invalid under tunnel
congestion (congestion windows exceed the effect size), so both variants
run in ONE process, interleaved, same inputs.

Usage: python benchmarks/ab_fused_gn.py [variant] [batch] [steps] [reps]
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from upgpt_tpu import zoo
    from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
    from upgpt_tpu.inference.pipeline import GenerationPipeline
    from upgpt_tpu.utils.diagnostics import cast_floating

    argv = sys.argv[1:]
    variant = argv[0] if argv else "mm_512"
    batch = int(argv[1]) if len(argv) > 1 else 8
    steps = int(argv[2]) if len(argv) > 2 else 50
    reps = int(argv[3]) if len(argv) > 3 else 5

    on_tpu = jax.devices()[0].platform != "cpu"
    base = zoo.build_latent_diffusion(
        variant, dtype="bfloat16" if on_tpu else "float32",
        use_flash_attention=on_tpu)

    def build(fused_gn: bool):
        cfg = dataclasses.replace(
            base.config,
            unet=dataclasses.replace(base.config.unet,
                                     use_fused_transformer=on_tpu,
                                     use_fused_groupnorm=fused_gn))
        return LatentDiffusion(cfg)

    model_off, model_on = build(False), build(True)
    # identical param VALUES: fused GN is a compute-path switch, the param
    # tree is unchanged — init once, share
    params = jax.jit(model_off.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    if on_tpu:
        params = cast_floating(params, jnp.bfloat16)

    rng = np.random.default_rng(0)
    h, w = base.config.latent_size
    concat_ch = base.config.unet.in_channels - base.config.latent_channels
    eb = {
        "text_emb": jnp.asarray(rng.normal(size=(batch, 77, 768)), jnp.float32),
        "style_emb": jnp.asarray(rng.normal(size=(batch, 9, 768)), jnp.float32),
        "person_mask": jnp.asarray(
            rng.normal(size=(batch, h, w, concat_ch)), jnp.float32),
    }
    if base.config.pose_input_dim:
        eb["smpl"] = jnp.asarray(rng.normal(size=(batch, 1, 85)), jnp.float32)
    key = jax.random.PRNGKey(42)

    pipes = {
        "gn_xla": GenerationPipeline(model_off, num_steps=steps, eta=1.0),
        "gn_fused": GenerationPipeline(model_on, num_steps=steps, eta=1.0),
    }
    for name, pipe in pipes.items():
        t0 = time.perf_counter()
        np.asarray(pipe.generate(params, eb, key))
        print(f"{name}: compiled+first in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    times = {k: [] for k in pipes}
    for r in range(reps):
        for name, pipe in pipes.items():  # interleaved, same inputs
            t0 = time.perf_counter()
            np.asarray(pipe.generate(params, eb, key))
            times[name].append(time.perf_counter() - t0)

    out = {}
    for name, ts in times.items():
        ts = np.asarray(ts)
        out[name] = (float(ts.min()), float(np.median(ts)))
        print(f"{name}: best {ts.min()*1e3:.1f} ms  median "
              f"{np.median(ts)*1e3:.1f} ms  all "
              f"{[round(t*1e3) for t in ts]}")
    ratio = out["gn_xla"][0] / out["gn_fused"][0]
    wins = sum(a > b for a, b in zip(times["gn_xla"], times["gn_fused"]))
    print(f"fused-GN speedup (best/best): {ratio:.3f}x; fused wins "
          f"{wins}/{reps} interleaved reps")

    from _ledger import record

    record(f"ab_fused_gn_{variant}", round(ratio, 3), "x_vs_xla_gn",
           batch=batch, steps=steps, reps=reps, wins=wins,
           xla_best_ms=round(out["gn_xla"][0] * 1e3, 1),
           fused_best_ms=round(out["gn_fused"][0] * 1e3, 1),
           xla_median_ms=round(out["gn_xla"][1] * 1e3, 1),
           fused_median_ms=round(out["gn_fused"][1] * 1e3, 1))


if __name__ == "__main__":
    main()
