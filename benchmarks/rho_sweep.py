"""Karras-grid rho sweep at very low step counts (tiny model, CPU-sized).

Round-4 finding: rho=7 karras BEATS uniform at 10 steps (full-geometry
MS-SSIM 0.9991 vs 0.9865) but LOSES at 5 steps (0.9250 vs 0.9496) — after
endpoint pinning only 3 interior steps remain and rho=7 pushes them all to
low noise, starving the high-noise regime. Hypothesis: a smaller rho
(flatter warp) re-balances the 5-step grid. This sweep trains the tiny
model once, then scores every (steps, rho) grid against the same DDIM-200
reference — a grid-design experiment, not a release benchmark (tiny
geometry; full-geometry confirmation goes through sampler_quality.py).

Run: python benchmarks/rho_sweep.py          (CPU ok, ~10-15 min)
     python benchmarks/rho_sweep.py --full   (TPU, full interp_256
                                              geometry, ~30 min)

Tiny-geometry finding (ledger `rho_sweep_tiny`): at 16 px EVERY grid
scores ~0.999 — the 80-step tiny score field is too smooth to
discriminate step placement (SSIM even reads 1.0002, numerics). Grid
design decisions therefore come from --full only.

Full-geometry findings (ledger `rho_sweep_full`, table in docs/PERF.md
round 4): 5-step quality is MONOTONE in rho and always below uniform
(rho=2: 0.47 ... rho=7: 0.885 < uniform 0.923) — grid shaping cannot
rescue 5-step serving. The karras/uniform crossover sits between 6 and
8 steps (6: uniform 0.9780 > karras 0.9705; 8: karras 0.9960 >> uniform
0.9682). Serving rule: --schedule karras from 8 steps up.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from sampler_quality import build_model, make_batch
    from upgpt_tpu.eval.metrics import ssim
    from upgpt_tpu.inference.pipeline import GenerationPipeline
    from upgpt_tpu.training.train_state import create_train_state, train_step

    full = "--full" in sys.argv
    on_tpu = jax.devices()[0].platform != "cpu"
    model = build_model(tiny=not full, on_tpu=on_tpu)
    cfg = model.config
    ctx_dim = cfg.context_dim or 768
    train_steps = 800 if full else 80
    batch = 8 if full else 4
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    frozen = {"vae": params.pop("vae")}
    state = create_train_state(params, learning_rate=1e-4, use_ema=True)
    bt = make_batch(cfg, batch, ctx_dim, tiny=not full)
    key = jax.random.PRNGKey(1)
    step_fn = jax.jit(
        lambda s: train_step(model, s, frozen, bt, key), donate_argnums=0)
    t0 = time.perf_counter()
    for _ in range(train_steps):
        state, metrics = step_fn(state)
    print(f"overfit: {train_steps} steps in {time.perf_counter()-t0:.0f}s, "
          f"loss {float(np.asarray(metrics['loss_simple'])):.4f}",
          file=sys.stderr)
    params = dict(state.params)
    params["vae"] = frozen["vae"]
    if on_tpu:
        from upgpt_tpu.utils.diagnostics import cast_floating

        params = cast_floating(params, jnp.bfloat16)

    eb = {k: bt[k] for k in ("text_emb", "style_emb", "smpl", "person_mask")}
    gen_key = jax.random.PRNGKey(42)

    def run_pipe(**kw):
        pipe = GenerationPipeline(model, eta=0.0, output_uint8=True, **kw)
        return np.asarray(pipe.generate(params, eb, gen_key))

    ref = run_pipe(num_steps=200)
    print("ref done", file=sys.stderr)

    def score(imgs):
        a = imgs.astype(np.float32) / 255.0
        b = ref.astype(np.float32) / 255.0
        return float(ssim(a, b))  # metrics.ssim takes batched (N,H,W,C)

    # uniform baselines + rho sweep through the pipeline's unipc route;
    # rho is threaded by monkey-patching the grid builder (the pipeline API
    # deliberately does not expose rho — this sweep DECIDES the default)
    import upgpt_tpu.diffusion.schedule as sched_mod
    import upgpt_tpu.diffusion.unipc as unipc_mod
    import upgpt_tpu.diffusion.dpm_solver as dpm_mod

    orig = sched_mod.make_karras_timesteps
    rows = []
    # full geometry: focused list (the 5-step regression + sanity rows);
    # tiny: the broad sweep (kept for harness rehearsal, known saturated)
    sweep = (((6, (7.0,)), (8, (7.0,)))
             if full else
             ((5, (2.0, 3.0, 5.0, 7.0)), (6, (2.0, 3.0, 5.0, 7.0)),
              (8, (2.0, 3.0, 5.0, 7.0)), (10, (2.0, 3.0, 5.0, 7.0))))
    for steps, rhos in sweep:
        t0 = time.perf_counter()
        rows.append((f"unipc{steps} uniform", score(run_pipe(
            num_steps=steps, sampler="unipc"))))
        print(f"  unipc{steps} uniform: {rows[-1][1]:.4f} "
              f"({time.perf_counter()-t0:.0f}s)", file=sys.stderr)
        for rho in rhos:
            def patched(schedule, num_steps, rho=rho):
                return orig(schedule, num_steps, rho=rho)

            sched_mod.make_karras_timesteps = patched
            unipc_mod.make_karras_timesteps = patched
            dpm_mod.make_karras_timesteps = patched
            try:
                s = score(run_pipe(num_steps=steps, sampler="unipc",
                                   schedule_method="karras"))
            finally:
                sched_mod.make_karras_timesteps = orig
                unipc_mod.make_karras_timesteps = orig
                dpm_mod.make_karras_timesteps = orig
            rows.append((f"unipc{steps} karras rho={rho:g}", s))
            print(f"  unipc{steps} rho={rho:g}: {s:.4f}", file=sys.stderr)

    print(f"{'grid':>24s} {'ssim_vs_ddim200':>16s}")
    for label, s in rows:
        print(f"{label:>24s} {s:16.4f}")

    from _ledger import record

    record("rho_sweep_full" if full else "rho_sweep_tiny",
           max(s for _, s in rows), "best_ssim",
           rows={l: round(s, 4) for l, s in rows}, tiny=not full,
           train_steps=train_steps, batch=batch)


if __name__ == "__main__":
    main()
