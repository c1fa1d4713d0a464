"""Same-process sampler face-off + dispatch audit (VERDICT r3 item 1).

Cross-process comparisons on the axon tunnel are confounded: its congestion
windows stretch dispatch 2-3x between runs, so UniPC-10 vs DPM++-20 numbers
from different processes disagree by more than the effect being measured
(docs/PERF.md round 3/4). Here both pipelines are compiled in ONE process
and their pipelined reps are INTERLEAVED (A,B,A,B,...), so every tunnel
regime hits both samplers equally; the ratio is the honest readout.

The script also audits WHERE the wall time goes per batch:
  - dispatch: time for pipe.generate() to return (host->tunnel program
    enqueue; JAX async dispatch means no device wait is included);
  - fence: np.asarray on the result (device compute drain + d2h wire);
  - wire floor: a fenced trivial jitted op on the same output-sized buffer
    (dispatch + d2h with ~zero device compute) — the tunnel's fixed tax.
On a directly-attached TPU host the wire floor is ~1-5 ms; everything the
floor eats here is tunnel-only residue, which is the proof-of-bound the
10-step serving claims rest on.

Usage: python benchmarks/bench_sampler_faceoff.py [batch] [reps]
"""

import os
import sys
import time
from collections import deque

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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    depth = int(os.environ.get("UPGPT_PIPE_DEPTH", "2"))
    n_pipe = 8

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    print(f"device: {dev}", file=sys.stderr)

    cfg = LatentDiffusionConfig.interp_256(
        unet=UNetConfig.interp_256(
            dtype=dtype, use_fused_transformer=on_tpu,
            use_flash_attention=on_tpu,
        ),
        vae=AutoencoderConfig.kl_f8(dtype=dtype, use_flash_attention=on_tpu),
    )
    model = LatentDiffusion(cfg)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    if on_tpu:
        from upgpt_tpu.utils.diagnostics import cast_floating

        params = cast_floating(params, jnp.bfloat16)

    contenders = {
        "unipc10": GenerationPipeline(model, num_steps=10, sampler="unipc",
                                      output_uint8=True),
        "dpmpp20": GenerationPipeline(model, num_steps=20, sampler="dpm++",
                                      output_uint8=True),
    }

    rng = np.random.default_rng(0)
    h, w = cfg.latent_size
    eb = {
        "text_emb": jnp.asarray(rng.normal(size=(batch, 77, 768)), jnp.float32),
        "style_emb": jnp.asarray(rng.normal(size=(batch, 9, 768)), jnp.float32),
        "smpl": jnp.asarray(rng.normal(size=(batch, 1, 85)), jnp.float32),
        "person_mask": jnp.asarray(
            rng.choice([-1.0, -0.99215686], size=(batch, h, w, 1)),
            jnp.float32),
    }
    key = jax.random.PRNGKey(42)

    for name, pipe in contenders.items():
        t0 = time.perf_counter()
        np.asarray(pipe.generate(params, eb, key))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)

    # ---- dispatch audit (one sampler is enough; dispatch cost is
    # program-independent on this tunnel) ----
    pipe = contenders["unipc10"]
    disp, fence = [], []
    for i in range(6):
        t0 = time.perf_counter()
        out = pipe.generate(params, eb, jax.random.fold_in(key, i))
        t1 = time.perf_counter()
        np.asarray(out)
        t2 = time.perf_counter()
        disp.append(t1 - t0)
        fence.append(t2 - t1)
    # wire floor: fenced trivial op on an output-sized uint8 buffer
    triv = jax.jit(lambda x: x + 1)
    buf = jnp.zeros((batch, h * 8, w * 8, 3), jnp.uint8)
    np.asarray(triv(buf))  # compile
    floor = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(triv(buf))
        floor.append(time.perf_counter() - t0)
    audit = {
        "dispatch_ms_best": round(min(disp) * 1e3, 1),
        "dispatch_ms_median": round(float(np.median(disp)) * 1e3, 1),
        "fence_ms_best": round(min(fence) * 1e3, 1),
        "wire_floor_ms_best": round(min(floor) * 1e3, 1),
        "wire_floor_ms_median": round(float(np.median(floor)) * 1e3, 1),
    }
    print(f"dispatch audit (unipc10, batch {batch}): {audit}")

    # ---- interleaved pipelined face-off ----
    rates = {name: [] for name in contenders}
    for rep in range(reps):
        for name, pipe in contenders.items():
            inflight = deque()
            t0 = time.perf_counter()
            for i in range(n_pipe):
                inflight.append(pipe.generate(
                    params, eb, jax.random.fold_in(key, 1000 * rep + i)))
                if len(inflight) > depth:
                    np.asarray(inflight.popleft())
            while inflight:
                np.asarray(inflight.popleft())
            rates[name].append(n_pipe * batch / (time.perf_counter() - t0))
    from _ledger import record

    summary = {}
    for name, rs in rates.items():
        summary[name] = {
            "best": round(max(rs), 2),
            "median": round(float(np.median(rs)), 2),
            "all": [round(r, 1) for r in rs],
        }
        print(f"{name}: pipelined depth={depth} best {max(rs):.2f} img/s, "
              f"median {np.median(rs):.2f}  {summary[name]['all']}")
    # per-rep win rate: interleaved pairs share tunnel conditions
    wins = sum(u > d for u, d in zip(rates["unipc10"], rates["dpmpp20"]))
    print(f"unipc10 beats dpmpp20 in {wins}/{reps} interleaved reps "
          f"(median ratio "
          f"{np.median(np.array(rates['unipc10'])/np.array(rates['dpmpp20'])):.2f}x)")
    record("sampler_faceoff_unipc10_vs_dpmpp20",
           float(np.median(np.array(rates["unipc10"])
                           / np.array(rates["dpmpp20"]))),
           "throughput_ratio", batch=batch, depth=depth, reps=reps,
           wins=wins, unipc10=summary["unipc10"], dpmpp20=summary["dpmpp20"],
           audit=audit)


if __name__ == "__main__":
    main()
