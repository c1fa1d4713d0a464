"""Headline benchmark: 256px pose-transfer sampling throughput on one chip.

Protocol (BASELINE.md config 1/2): interp_256 flagship geometry — U-Net
224ch, latent 32x24x4, hybrid mask concat, 87-token context (77 text + 9
style + 1 SMPL) — DDIM-50 + kl-f8 VAE decode, the ENTIRE sampler one jitted
XLA program, bf16 compute with fp32 islands. Weights are random (the released
torch checkpoint is not downloadable in this sandbox); timing is
weight-value-independent.

Prints ONE JSON line:
  {"metric": "images_per_sec_per_chip_256px_ddim50", "value": ..., "unit":
   "img/s", "vs_baseline": ...}

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
A100 PyTorch-eager baseline is estimated analytically and conservatively in
the reference's favor: measured FLOPs/image of this exact pipeline divided
into an optimistic A100 effective rate (TF32 peak 156 TFLOP/s x 0.25 MFU —
high for eager torch 1.11 at 32x24 spatial dims, so our ratio is understated).
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from upgpt_tpu.diffusion.latent_diffusion import (
        LatentDiffusion, LatentDiffusionConfig,
    )
    from upgpt_tpu.inference.pipeline import GenerationPipeline
    from upgpt_tpu.models.unet import UNetConfig
    from upgpt_tpu.models.vae import AutoencoderConfig

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = 50

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    on_tpu = dev.platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    cfg = LatentDiffusionConfig.interp_256(
        unet=UNetConfig.interp_256(dtype=dtype),  # flash attention on by default
        vae=AutoencoderConfig.kl_f8(dtype=dtype, use_flash_attention=on_tpu),
    )
    model = LatentDiffusion(cfg)
    # init under jit (eager init is thousands of tunnel round-trips on axon)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    if on_tpu:
        from upgpt_tpu.utils.diagnostics import cast_floating

        # serve in bf16: halves weight HBM traffic per U-Net step
        params = cast_floating(params, jnp.bfloat16)
    pipe = GenerationPipeline(model, num_steps=steps, eta=1.0)

    rng = np.random.default_rng(0)
    h, w = cfg.latent_size
    eb = {
        "text_emb": jnp.asarray(rng.normal(size=(batch, 77, 768)), jnp.float32),
        "style_emb": jnp.asarray(rng.normal(size=(batch, 9, 768)), jnp.float32),
        "smpl": jnp.asarray(rng.normal(size=(batch, 1, 85)), jnp.float32),
        "person_mask": jnp.asarray(
            rng.choice([-1.0, -0.99215686], size=(batch, h, w, 1)), jnp.float32
        ),
    }
    key = jax.random.PRNGKey(42)

    # compile + warmup. NOTE: block_until_ready does not reliably block on
    # the axon tunnel backend — force a host transfer to fence timing.
    t0 = time.perf_counter()
    out = pipe.generate(params, eb, key)
    np.asarray(out)
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # timed runs (each fenced by a host transfer; transfer is ~5 MB, <1 ms)
    n_runs = 5
    t0 = time.perf_counter()
    for i in range(n_runs):
        out = pipe.generate(params, eb, jax.random.fold_in(key, i))
        np.asarray(out)
    dt = (time.perf_counter() - t0) / n_runs
    imgs_per_sec = batch / dt
    print(f"batch={batch} steps={steps}: {dt*1000:.1f} ms/batch, "
          f"{imgs_per_sec:.2f} img/s", file=sys.stderr)

    # analytic A100 torch-eager baseline (see module docstring)
    try:
        lowered = jax.jit(pipe._sample_impl, static_argnames=("shared_x_T",)).lower(
            params, eb, key, shared_x_T=False
        )
        cost = lowered.compile().cost_analysis()
        flops_total = float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception as e:  # cost analysis is best-effort on some backends
        print(f"cost_analysis failed: {e}", file=sys.stderr)
        flops_total = 0.0
    if flops_total > 0:
        flops_per_image = flops_total / batch
        a100_effective = 156e12 * 0.25
        ref_imgs_per_sec = a100_effective / flops_per_image
        print(f"FLOPs/image: {flops_per_image/1e12:.2f} TF, "
              f"A100-estimate: {ref_imgs_per_sec:.2f} img/s", file=sys.stderr)
    else:
        ref_imgs_per_sec = float("nan")

    vs = imgs_per_sec / ref_imgs_per_sec if np.isfinite(ref_imgs_per_sec) else None
    print(json.dumps({
        "metric": "images_per_sec_per_chip_256px_ddim50",
        "value": round(imgs_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
