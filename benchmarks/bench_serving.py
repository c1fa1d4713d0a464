"""Serving-engine throughput/latency on the flagship interp_256 model.

Streams N_REQ independent requests (each its own conditioning) through
inference.serving.ServingEngine at the serving batch size and reports
sustained request throughput plus queueing+compute latency percentiles.
Usage: python benchmarks/bench_serving.py [batch] [n_batches] [steps] \
           [sampler] [schedule]
       python benchmarks/bench_serving.py chained [batch] [n_batches] \
           [steps] [sampler] [schedule]  # end-to-end 256->512 two-stage

The quality-matched serving point (VERDICT r4 weak #2) is
`bench_serving.py 64 8 8 unipc karras` — UniPC-8 on the karras grid at
batch 64 through the REAL ServingEngine (request batching, padding,
futures, depth-2 in flight), not the raw pipeline. UPGPT_IN_FLIGHT
overrides the dispatched-batch depth (default 2).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from upgpt_tpu.diffusion.latent_diffusion import (
        LatentDiffusion, LatentDiffusionConfig,
    )
    from upgpt_tpu.inference.pipeline import GenerationPipeline
    from upgpt_tpu.inference.serving import ServingEngine
    from upgpt_tpu.models.unet import UNetConfig
    from upgpt_tpu.models.vae import AutoencoderConfig
    from upgpt_tpu.utils.compile_cache import enable_persistent_cache
    from upgpt_tpu.utils.diagnostics import cast_floating

    enable_persistent_cache()
    argv = sys.argv[1:]
    chained = bool(argv) and argv[0] == "chained"
    if chained:
        argv = argv[1:]
    batch = int(argv[0]) if argv else (8 if chained else 32)
    n_batches = int(argv[1]) if len(argv) > 1 else (3 if chained else 6)
    steps = int(argv[2]) if len(argv) > 2 else (20 if chained else 50)
    sampler = argv[3] if len(argv) > 3 else ("dpm++" if chained else "ddim")
    schedule = argv[4] if len(argv) > 4 else "uniform"
    in_flight = int(os.environ.get("UPGPT_IN_FLIGHT", "2"))
    # the ODE samplers and the karras grid are eta-0 deterministic paths
    eta = 0.0 if (sampler in ("dpm++", "unipc") or schedule == "karras") else 1.0

    dev = jax.devices()[0]
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
        params = cast_floating(params, jnp.bfloat16)
    if chained:
        from upgpt_tpu.inference.pipeline import ChainedUpscalePipeline

        up_cfg = LatentDiffusionConfig.upscale_512(
            unet=UNetConfig.upscale_512(
                dtype=dtype,  # fused GN off since r3 (layout copies; PERF.md)
                use_fused_transformer=on_tpu,
            ),
            vae=AutoencoderConfig.kl_f4(
                dtype=dtype, use_flash_attention=on_tpu),
        )
        up_model = LatentDiffusion(up_cfg)
        up_params = jax.jit(up_model.init_params)(jax.random.PRNGKey(1))
        jax.block_until_ready(up_params)
        if on_tpu:
            up_params = cast_floating(up_params, jnp.bfloat16)
        params = {"base": params, "up": up_params}
        pipe = ChainedUpscalePipeline(
            model, up_model, num_steps=steps, eta=eta, sampler=sampler,
            output_uint8=True, schedule_method=schedule)
    else:
        pipe = GenerationPipeline(
            model, num_steps=steps, eta=eta, sampler=sampler,
            output_uint8=True, schedule_method=schedule)

    h, w = cfg.latent_size
    rng = np.random.default_rng(0)

    def cond(i):
        return {
            "text_emb": rng.normal(size=(77, 768)).astype(np.float32),
            "style_emb": rng.normal(size=(9, 768)).astype(np.float32),
            "smpl": rng.normal(size=(1, 85)).astype(np.float32),
            "person_mask": rng.choice(
                [-1.0, -0.99215686], size=(h, w, 1)).astype(np.float32),
        }

    eng = ServingEngine(pipe, params, batch_size=batch, max_delay_s=0.1,
                        max_in_flight=in_flight)
    eng.start()
    # warmup batch (compile / cache load)
    t0 = time.perf_counter()
    warm = [eng.submit(cond(i)) for i in range(batch)]
    [f.result() for f in warm]
    print(f"warmup (compile/load): {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)
    eng.stats.latencies_s.clear()
    warm_batches = eng.stats.batches

    n_req = batch * n_batches
    t0 = time.perf_counter()
    futs = [eng.submit(cond(i)) for i in range(n_req)]
    outs = [f.result() for f in futs]
    dt = time.perf_counter() - t0
    eng.stop()
    assert all(o.dtype == np.uint8 for o in outs)

    s = eng.stats.summary()
    print(f"{n_req} requests in {dt:.2f}s over "
          f"{eng.stats.batches - warm_batches} batches "
          f"(occupancy incl. warmup {s['occupancy']:.2f})", file=sys.stderr)
    tag = "512px_chained" if chained else "256px"
    sched_tag = "" if schedule == "uniform" else f"_{schedule}"
    print(json.dumps({
        "metric": f"serving_requests_per_sec_{tag}_{sampler}{steps}{sched_tag}",
        "value": round(n_req / dt, 3),
        "unit": "req/s",
        "img_per_s": round(n_req / dt, 2),
        "p50_latency_s": s["p50_latency_s"],
        "p95_latency_s": s["p95_latency_s"],
        "occupancy": s["occupancy"],
    }))
    from _ledger import record

    record(f"serving_requests_per_sec_{tag}_{sampler}{steps}{sched_tag}",
           n_req / dt, "req/s", batch=batch, in_flight=in_flight,
           p50_latency_s=s["p50_latency_s"],
           p95_latency_s=s["p95_latency_s"], occupancy=s["occupancy"])


if __name__ == "__main__":
    main()
