"""Capture a jax.profiler trace of the full sampling pipeline (+ a summary
of device-op durations parsed from the trace proto).

Usage: python benchmarks/trace_pipeline.py [batch] [steps] [outdir]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def summarize_trace(logdir: str, top: int = 40):
    """Parse the .trace.json.gz and aggregate device-op durations."""
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace file found under", logdir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid with 'TPU' in process name and thread named XLA Ops
    proc_names = {}
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    dur_by_op = defaultdict(float)
    cnt_by_op = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        tname = thread_names.get((e.get("pid"), e.get("tid")), "")
        pname = proc_names.get(e.get("pid"), "")
        if "TPU" not in pname and "tpu" not in pname.lower():
            continue
        if "XLA Op" not in tname and "Steps" in tname:
            continue
        if "XLA Op" not in tname:
            continue
        name = e.get("name", "?")
        dur_by_op[name] += e.get("dur", 0.0)
        cnt_by_op[name] += 1
        total += e.get("dur", 0.0)
    print(f"total device op time: {total/1e3:.1f} ms across {len(dur_by_op)} ops")
    for name, dur in sorted(dur_by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur/1e3:9.2f} ms  x{cnt_by_op[name]:<5d} {name[:110]}")


def main():
    import jax
    import jax.numpy as jnp

    from upgpt_tpu.diffusion.latent_diffusion import (
        LatentDiffusion, LatentDiffusionConfig,
    )
    from upgpt_tpu.inference.pipeline import GenerationPipeline
    from upgpt_tpu.models.unet import UNetConfig
    from upgpt_tpu.models.vae import AutoencoderConfig
    from upgpt_tpu.utils.diagnostics import cast_floating

    argv = sys.argv[1:]
    variant = "interp_256"
    if argv and not argv[0].isdigit():  # optional leading variant name
        variant = argv.pop(0)
    batch = int(argv[0]) if argv else (8 if variant != "interp_256" else 32)
    steps = int(argv[1]) if len(argv) > 1 else 50
    outdir = argv[2] if len(argv) > 2 else f"/tmp/trace_pipe_{variant}"

    dtype = jnp.bfloat16
    if variant == "interp_256":
        cfg = LatentDiffusionConfig.interp_256(
            unet=UNetConfig.interp_256(dtype=dtype,
                                       use_fused_transformer=True),
            vae=AutoencoderConfig.kl_f8(dtype=dtype,
                                        use_flash_attention=True),
        )
        model = LatentDiffusion(cfg)
    else:
        import dataclasses

        from upgpt_tpu import zoo

        m0 = zoo.build_latent_diffusion(variant, dtype="bfloat16",
                                        use_flash_attention=True)
        cfg = dataclasses.replace(
            m0.config,
            unet=dataclasses.replace(m0.config.unet,
                                     use_fused_transformer=True),
        )
        model = LatentDiffusion(cfg)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    params = cast_floating(params, jnp.bfloat16)
    pipe = GenerationPipeline(model, num_steps=steps, eta=1.0)

    rng = np.random.default_rng(0)
    h, w = cfg.latent_size
    concat_ch = cfg.unet.in_channels - cfg.latent_channels
    eb = {
        "text_emb": jnp.asarray(rng.normal(size=(batch, 77, 768)), jnp.float32),
        "style_emb": jnp.asarray(rng.normal(size=(batch, 9, 768)), jnp.float32),
        "person_mask": jnp.asarray(
            rng.normal(size=(batch, h, w, concat_ch)), jnp.float32),
    }
    if cfg.pose_input_dim:
        eb["smpl"] = jnp.asarray(rng.normal(size=(batch, 1, 85)), jnp.float32)
    key = jax.random.PRNGKey(42)
    np.asarray(pipe.generate(params, eb, key))  # compile
    import time
    t0 = time.perf_counter()
    np.asarray(pipe.generate(params, eb, key))
    print(f"warm run: {time.perf_counter()-t0:.2f}s", file=sys.stderr)

    with jax.profiler.trace(outdir):
        out = pipe.generate(params, eb, key)
        np.asarray(out)
    summarize_trace(outdir)


if __name__ == "__main__":
    main()
