"""512px-stage benchmarks: mm_512 direct sampling and the upscale stage.

Measures DDIM-50 + decode img/s at batch 8 for:
  - mm_512: 64x48 latent (T=3072 self-attention -> Pallas flash path)
  - upscale: 128x96x3 kl-f4 latent, lr-concat conditioning

`train` mode measures the full training step (frozen-VAE encode ->
q_sample -> U-Net fwd+bwd -> AdamW + EMA) at the same geometry — the
T=3072 backward runs the blocked Pallas flash backward, which is what
makes this batch size fit at all (the XLA recompute backward materializes
b*h fp32 (3072, 3072) score tensors per transformer layer).

Usage: python benchmarks/bench_512.py [mm_512|upscale] [batch]
       python benchmarks/bench_512.py train [mm_512|upscale] [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_train(model, params, variant, batch):
    import time

    import jax
    import jax.numpy as jnp

    from upgpt_tpu.training.train_state import create_train_state, train_step

    cfg = model.config
    frozen = {"vae": params.pop("vae")}
    state = create_train_state(params, learning_rate=2e-6, use_ema=True)

    rng = np.random.default_rng(0)
    h, w = cfg.latent_size
    f = 2 ** (len(cfg.vae.ch_mult) - 1)
    concat_ch = cfg.unet.in_channels - cfg.latent_channels
    bt = {
        "image": jnp.asarray(rng.normal(size=(batch, h * f, w * f, 3)) * 0.3,
                             jnp.float32),
        "person_mask": jnp.asarray(
            rng.normal(size=(batch, h, w, concat_ch)), jnp.float32),
        "text_emb": jnp.asarray(rng.normal(size=(batch, 77, 768)), jnp.float32),
        "style_emb": jnp.asarray(rng.normal(size=(batch, 9, 768)), jnp.float32),
        "loss_w": jnp.ones((batch, h, w, 1), jnp.float32),
    }
    if cfg.pose_input_dim:
        bt["smpl"] = jnp.asarray(rng.normal(size=(batch, 1, 85)), jnp.float32)
    key = jax.random.PRNGKey(1)
    step_fn = jax.jit(
        lambda s: train_step(model, s, frozen, bt, key), donate_argnums=0)

    t0 = time.perf_counter()
    state, metrics = step_fn(state)
    loss0 = float(metrics["loss"])
    print(f"train {variant}: compile+first {time.perf_counter()-t0:.1f}s, "
          f"loss {loss0:.4f}", file=sys.stderr)
    best = float("inf")
    for _ in range(3):
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step_fn(state)
        np.asarray(metrics["loss"])  # fence
        best = min(best, (time.perf_counter() - t0) / n * 1000)
    print(f"train {variant} batch={batch}: {best:.1f} ms/step, "
          f"{batch / best * 1000:.1f} img/s")
    from _ledger import record

    record(f"train_{variant}_ms_per_step", best, "ms",
           batch=batch, img_per_s=round(batch / best * 1000, 1))


def main():
    import jax
    import jax.numpy as jnp

    from upgpt_tpu import zoo
    from upgpt_tpu.inference.pipeline import GenerationPipeline
    from upgpt_tpu.utils.diagnostics import cast_floating

    train = len(sys.argv) > 1 and sys.argv[1] == "train"
    argv = sys.argv[2:] if train else sys.argv[1:]
    variant = argv[0] if argv else "mm_512"
    batch = int(argv[1]) if len(argv) > 1 else 8
    steps = int(argv[2]) if len(argv) > 2 else 50
    sampler = argv[3] if len(argv) > 3 else "ddim"
    schedule = argv[4] if len(argv) > 4 else "uniform"  # uniform/quad/karras

    on_tpu = jax.devices()[0].platform != "cpu"
    model = zoo.build_latent_diffusion(
        variant, dtype="bfloat16" if on_tpu else "float32",
        use_flash_attention=on_tpu,
    )
    import dataclasses
    model.config = dataclasses.replace(
        model.config,
        unet=dataclasses.replace(
            model.config.unet,
            use_fused_transformer=on_tpu,
        ),
    )
    from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
    model = LatentDiffusion(model.config)

    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    if train:
        # f32 master params/moments/EMA, exactly like training/trainer.py
        # (bf16 is compute dtype only); casting masters here would halve
        # the optimizer's HBM traffic and overstate throughput
        return bench_train(model, params, variant, batch)
    if on_tpu:
        params = cast_floating(params, jnp.bfloat16)
    pipe = GenerationPipeline(model, num_steps=steps, eta=1.0,
                              output_uint8=True, sampler=sampler,
                              schedule_method=schedule)

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
    print(f"{variant} batch={batch} {sampler} steps={steps}: best "
          f"{best*1000:.1f} ms (median {np.median(times)*1000:.1f}), "
          f"{batch/best:.2f} img/s sequential")

    # pipelined/serving mode (VERDICT r2 item 4): batches in flight so d2h
    # (and, depth>=2, host dispatch) of batch i overlaps later batches'
    # compute — same pattern as bench.py
    from collections import deque

    n_pipe = 4
    depth = int(os.environ.get("UPGPT_PIPE_DEPTH", "2"))
    rates = []
    for rep in range(4):
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
    # headline = the faster serving mode; a pipelining regression now shows
    # up as pipelined < sequential in the ledger instead of being masked
    throughput = max(pipelined, seq_rate)
    print(f"{variant} pipelined depth={depth} (best of {len(rates)} x "
          f"{n_pipe} batches): {pipelined:.2f} img/s "
          f"(sequential {seq_rate:.2f})")

    # roofline: analytic FLOPs from flop_count.py's exact module walk
    try:
        from flop_count import PEAK_TFS, VARIANTS, decoder_flops, unet_flops

        v = VARIANTS[variant]
        per_image = unet_flops(v) * steps + decoder_flops(v)
        mfu = throughput * per_image / (PEAK_TFS * 1e12)
        print(f"{variant}: {per_image/1e12:.2f} TF/image -> MFU "
              f"{mfu*100:.0f}% (speed-of-light "
              f"{PEAK_TFS*1e12/per_image:.1f} img/s)")
    except KeyError:
        mfu = None
    from _ledger import record

    sched_tag = "" if schedule == "uniform" else f"_{schedule}"
    record(f"sample_{variant}_{sampler}{steps}{sched_tag}", throughput,
           "img/s",
           batch=batch, sequential_best_ms=round(best * 1000, 1),
           pipelined_img_per_s=round(pipelined, 2),
           sequential_img_per_s=round(seq_rate, 2),
           pipeline_depth=depth,
           mfu=round(mfu, 3) if mfu else None)


if __name__ == "__main__":
    main()
