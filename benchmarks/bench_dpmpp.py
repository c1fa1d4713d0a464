"""DPM-Solver++(2M) serving throughput at the flagship geometry.

Same protocol as bench.py (interp_256, kl-f8 decode, bf16, uint8 output,
pipelined one-batch-in-flight) but the sampler is DPM-Solver++(2M) at
--steps (default 20) model calls — the step count at which 2M multistep
solvers match DDIM-50 sample quality in the diffusion literature. The
point: images/sec for the SAME perceptual quality, i.e. effective serving
throughput beyond the DDIM-50 protocol number.

Usage: python benchmarks/bench_dpmpp.py [batch] [steps] [sampler]
sampler: dpm++ (default) or unipc — UniPC-2's corrector costs zero extra
model evals; measured quality at 10 steps equals DPM++-10 (the full
sampler-quality table is in docs/PERF.md round 4). At <=10 steps use
batch 64: per-image device time is flat 32->64 and dispatch amortizes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from upgpt_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from upgpt_tpu.diffusion.latent_diffusion import (
        LatentDiffusion, LatentDiffusionConfig,
    )
    from upgpt_tpu.inference.pipeline import GenerationPipeline
    from upgpt_tpu.models.unet import UNetConfig
    from upgpt_tpu.models.vae import AutoencoderConfig

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sampler = sys.argv[3] if len(sys.argv) > 3 else "dpm++"
    schedule = sys.argv[4] if len(sys.argv) > 4 else "uniform"  # or karras

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    on_tpu = dev.platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    cfg = LatentDiffusionConfig.interp_256(
        unet=UNetConfig.interp_256(
            dtype=dtype,  # fused GN off since r3 (layout copies; PERF.md)
            use_fused_transformer=on_tpu,
        ),
        vae=AutoencoderConfig.kl_f8(dtype=dtype, use_flash_attention=on_tpu),
    )
    model = LatentDiffusion(cfg)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    if on_tpu:
        from upgpt_tpu.utils.diagnostics import cast_floating

        params = cast_floating(params, jnp.bfloat16)
    pipe = GenerationPipeline(
        model, num_steps=steps, sampler=sampler, output_uint8=True,
        schedule_method=schedule)

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

    t0 = time.perf_counter()
    np.asarray(pipe.generate(params, eb, key))
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(8):
        t0 = time.perf_counter()
        out = pipe.generate(params, eb, jax.random.fold_in(key, i))
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"batch={batch} {sampler} steps={steps}: sequential best "
          f"{best*1000:.1f} ms/batch (median {np.median(times)*1000:.1f})",
          file=sys.stderr)

    # depth>=2 keeps the device fed while the host runs batch i's fence:
    # at ~10 steps the per-batch dispatch is comparable to device time, so
    # one-in-flight leaves the device idle during every dispatch window
    from collections import deque

    depth = int(os.environ.get("UPGPT_PIPE_DEPTH", "2"))
    n_pipe, rates = 8, []
    for rep in range(5):
        inflight = deque()
        t0 = time.perf_counter()
        for i in range(n_pipe):
            inflight.append(pipe.generate(
                params, eb, jax.random.fold_in(key, 100 * rep + i)))
            if len(inflight) > depth:
                np.asarray(inflight.popleft())
        while inflight:
            np.asarray(inflight.popleft())
        rates.append(n_pipe * batch / (time.perf_counter() - t0))
    pipelined = max(rates)
    seq_rate = batch / best
    imgs_per_sec = max(pipelined, seq_rate)
    print(f"pipelined depth={depth} (best of {len(rates)} x {n_pipe}): "
          f"{pipelined:.2f} img/s (sequential {seq_rate:.2f}) at "
          f"{sampler}-{steps}", file=sys.stderr)
    print({"sampler": sampler, "steps": steps, "batch": batch,
           "img_per_sec": round(imgs_per_sec, 2)})
    from _ledger import record

    tag = "dpmpp" if sampler == "dpm++" else sampler
    if schedule != "uniform":
        tag += f"_{schedule}"
    record(f"sample_interp256_{tag}{steps}", imgs_per_sec, "img/s",
           batch=batch, sequential_best_ms=round(best * 1000, 1),
           pipelined_img_per_s=round(pipelined, 2),
           sequential_img_per_s=round(seq_rate, 2), pipeline_depth=depth)


if __name__ == "__main__":
    main()
