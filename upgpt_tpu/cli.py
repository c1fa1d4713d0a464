"""Command-line driver: train / sample / test / eval / convert.

The main.py equivalent (reference main.py:518-801) re-shaped around the
functional stack: YAML configs merge left-to-right with key=value dotlist
overrides, objects build through the `target:`/`params:` registry, and every
run directory carries its merged config for reproducibility
(main.py:280-288).

    python -m upgpt_tpu.cli train  --base configs/deepfashion/interp_256.yaml
    python -m upgpt_tpu.cli sample --base ... --ckpt logs/run/checkpoints/best
    python -m upgpt_tpu.cli test   --base ... --ckpt ...   # dump + metrics
    python -m upgpt_tpu.cli eval   --dir logs/run/results
    python -m upgpt_tpu.cli convert --torch-ckpt model.ckpt --out weights/
    python -m upgpt_tpu.cli serve  --base ... --ckpt ... --port 8000
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from upgpt_tpu.config import instantiate_from_config, merge_configs


def _build_cond_encoder(cfg, model, allow_debug=False):
    clip_cfg = cfg.get("clip") or {}
    if clip_cfg.get("text_params") and clip_cfg.get("bpe_path"):
        import orbax.checkpoint as ocp

        from upgpt_tpu.data.tokenizer import CLIPTokenizer
        from upgpt_tpu.inference.encoders import CLIPConditioningEncoder

        ckptr = ocp.StandardCheckpointer()
        return CLIPConditioningEncoder(
            text_params=ckptr.restore(Path(clip_cfg["text_params"]).absolute()),
            vision_params=ckptr.restore(Path(clip_cfg["vision_params"]).absolute()),
            tokenizer=CLIPTokenizer(bpe_path=clip_cfg["bpe_path"]),
        )
    if not allow_debug:
        raise SystemExit(
            "no CLIP weights configured (clip.text_params / clip.bpe_path). "
            "Training/sampling with hash embeddings produces garbage; pass "
            "--debug-encoder to proceed deliberately, or convert CLIP "
            "weights first (cli convert)."
        )
    print("WARNING: --debug-encoder -> DebugConditioningEncoder "
          "(hash embeddings; NOT output parity)", file=sys.stderr)
    from upgpt_tpu.inference.encoders import DebugConditioningEncoder

    return DebugConditioningEncoder(context_dim=model.config.context_dim)


def _loaders(cfg, batch_size, compact=False, train_transform=None):
    import jax

    from upgpt_tpu.data.deepfashion import (
        DataLoader, PrefetchDataLoader, ProcessDataLoader,
    )

    # multi-host: each host loads its disjoint slice of every global batch
    # (DistributedSampler semantics; mesh.shard_batch assembles the rest)
    proc = dict(process_index=jax.process_index(),
                process_count=jax.process_count())
    data_cfg = cfg.get("data") or {}
    out = {}
    for split in ("train", "validation", "test"):
        if split in data_cfg:
            split_cfg = data_cfg[split]
            if split == "train" and compact:
                # uint8 transport end-to-end (worker IPC + h2d); exact for
                # uint8-sourced pixels — see DeepFashionPair(compact=...)
                split_cfg = dict(split_cfg)
                split_cfg["params"] = {
                    **(split_cfg.get("params") or {}), "compact": True,
                }
            ds = instantiate_from_config(split_cfg)
            if split == "train":
                # parallel decode + prefetch so the input pipeline overlaps
                # the device step (reference worker processes, main.py:208-250);
                # data.loader: "process" selects true worker processes
                cls = (ProcessDataLoader
                       if data_cfg.get("loader") == "process"
                       else PrefetchDataLoader)
                out[split] = cls(
                    ds, batch_size, shuffle=True,
                    num_workers=int(data_cfg.get("num_workers", 0)),
                    batch_transform=train_transform, **proc,
                )
            else:
                out[split] = DataLoader(ds, batch_size, shuffle=False, **proc)
    return out


def cmd_train(cfg, args):
    import jax

    from upgpt_tpu.parallel.mesh import create_mesh
    from upgpt_tpu.training.trainer import Trainer, TrainerConfig

    model = instantiate_from_config(cfg["model"])
    tcfg = dict(cfg.get("trainer") or {})
    # default compact (uint8) host->device transport ON for accelerator
    # backends — exact for uint8-sourced images; YAML can override
    tcfg.setdefault("compact_transport",
                    jax.default_backend() not in ("cpu",))
    tc = TrainerConfig(**tcfg)
    # data-parallel mesh over ALL devices (reference DDP uses every requested
    # GPU, main.py:581); round the global batch up to a multiple of the
    # device count rather than silently idling chips
    n_dev = len(jax.devices())
    if tc.batch_size % n_dev:
        import dataclasses as _dc
        import math

        new_bs = math.ceil(tc.batch_size / n_dev) * n_dev
        print(f"batch_size {tc.batch_size} -> {new_bs} "
              f"(global batch must divide over all {n_dev} devices)",
              file=sys.stderr)
        tc = _dc.replace(tc, batch_size=new_bs)
    mesh = create_mesh((n_dev, 1)) if n_dev > 1 else None
    enc = _build_cond_encoder(
        cfg, model, allow_debug=getattr(args, "debug_encoder", False)
    )
    trainer = Trainer(model, tc, enc, mesh=mesh)
    (Path(tc.logdir) / "configs").mkdir(parents=True, exist_ok=True)
    with open(Path(tc.logdir) / "configs" / "merged.json", "w") as f:
        json.dump(cfg, f, indent=2, default=str)
    # train loader runs conditioning encode + transport pack in its
    # producer (batch_transform) so host post-processing overlaps the step
    loaders = _loaders(cfg, tc.batch_size, compact=tc.compact_transport,
                       train_transform=trainer.host_encode)
    params = frozen = None
    if getattr(args, "finetune_from", None):
        # --finetune_from: weights only, fresh optimizer (main.py:597-609)
        all_params = _restore_params(model, args.finetune_from)
        frozen = {"vae": all_params.pop("vae")}
        params = all_params
    trainer.fit(loaders["train"], loaders.get("validation"),
                params=params, frozen_params=frozen, resume=args.resume)


def _restore_params(model, ckpt_path, require_vae=True):
    """Restore full inference params (denoiser + pose + VAE) from either a
    `cli convert` layout (submodel trees) or a trainer checkpoint (which
    carries the frozen VAE in its `frozen` payload; EMA preferred for eval,
    reference ema_scope ddpm.py:179-192)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(Path(ckpt_path).absolute())
    if "unet" in payload:
        # `cli convert` layout: submodel trees at the top level
        params = {k: v for k, v in payload.items()
                  if k in ("unet", "pose", "vae", "cond_fusion")}
        vae = payload.get("vae")
    else:
        # trainer layout, prefer EMA weights for eval (ema_scope)
        params = dict(payload.get("ema") or payload["params"])
        vae = (payload.get("frozen") or {}).get("vae")
    if vae is None:
        if require_vae:
            raise RuntimeError(
                f"checkpoint {ckpt_path} carries no VAE (first-stage) "
                "weights — decoding would use a random VAE. Re-save with a "
                "current trainer (checkpoints now embed the frozen VAE) or "
                "convert the reference VAE ckpt and pass it explicitly."
            )
        import jax

        vae = model.init_params(jax.random.PRNGKey(0))["vae"]
    params = dict(params)
    params["vae"] = vae
    return params


def _tp_shard(model, params, tp, batch_size=None):
    """Serving-side tensor parallelism (parallel/tp.py): 2D (data x model)
    mesh, Megatron split on the U-Net transformer matmuls. Returns
    (model, params, put_batch) where put_batch device_puts a batch dict
    sharded on the data axis. tp<=1 is a no-op.

    The Pallas kernels are per-device programs GSPMD cannot partition, so
    the TP model runs the XLA attention/GN path (tp.py scope note) — the
    returned model is rebuilt with the fused-kernel flags off.
    """
    if not tp or tp <= 1:
        return model, params, lambda b: b
    import jax

    from upgpt_tpu.parallel import tp as tp_mod
    from upgpt_tpu.parallel.mesh import batch_sharding, create_mesh

    n_dev = len(jax.devices())
    if n_dev % tp:
        raise SystemExit(f"--tp {tp} does not divide {n_dev} devices")
    if batch_size and batch_size % (n_dev // tp):
        raise SystemExit(
            f"--batch {batch_size} does not divide the data axis "
            f"({n_dev} devices / tp {tp} = {n_dev // tp} shards)")
    model = _xla_path_model(model)
    cfg = model.config
    mesh = create_mesh((n_dev // tp, tp))
    tp_mod.validate_divisibility(
        params, tp=tp, num_heads=cfg.unet.num_heads)
    params = tp_mod.shard_params(mesh, params)
    bsh = batch_sharding(mesh)
    return model, params, (
        lambda b: {k: jax.device_put(v, bsh) for k, v in b.items()})


def cmd_sample(cfg, args):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from upgpt_tpu.inference.pipeline import GenerationPipeline

    model = instantiate_from_config(cfg["model"])
    params = _restore_params(model, args.ckpt)
    model, distill_ts = _distill_sidecar(model, args.ckpt)
    enc = _build_cond_encoder(
        cfg, model, allow_debug=getattr(args, "debug_encoder", False)
    )
    model, params, put_batch = _tp_shard(
        model, params, getattr(args, "tp", 1), batch_size=args.batch)
    samp = cfg.get("sampling") or {}
    if distill_ts is not None:
        # distilled student: its grid IS the sampler (eta-0 DDIM on the
        # exact trained t-points); --steps/--sampler flags don't apply
        pipe = GenerationPipeline(
            model, num_steps=len(distill_ts), eta=0.0,
            timesteps=distill_ts)
    else:
        pipe = GenerationPipeline(
            model,
            num_steps=args.steps or samp.get("ddim_steps", 200),
            eta=samp.get("eta", 1.0),
            guidance_scale=samp.get("guidance_scale", 1.0),
            sampler=getattr(args, "sampler", None) or samp.get("sampler", "ddim"),
            schedule_method=getattr(args, "schedule", None)
            or samp.get("schedule", "uniform"),
        )
    loaders = _loaders(cfg, args.batch)
    loader = loaders.get("test") or loaders.get("validation") or loaders["train"]
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    raw = next(loader.epoch(0))
    batch = enc.encode_batch(raw)
    batch = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
    imgs = np.asarray(
        pipe.generate(params, put_batch(batch), jax.random.PRNGKey(args.seed)))
    for i, img in enumerate(imgs):
        arr = np.clip((img + 1) / 2, 0, 1)
        Image.fromarray((arr * 255).astype(np.uint8)).save(out_dir / f"sample_{i:03d}.jpg")
    print(f"wrote {len(imgs)} samples to {out_dir}")


def cmd_test(cfg, args):
    """Batch evaluation: sample all test pairs, dump paired dirs, run metrics
    (reference test_step ddpm.py:1327-1377 + auto-eval main.py:797-801)."""
    import jax
    import jax.numpy as jnp

    from upgpt_tpu.eval.harness import dump_test_results, evaluate_dirs
    from upgpt_tpu.inference.pipeline import GenerationPipeline

    model = instantiate_from_config(cfg["model"])
    params = _restore_params(model, args.ckpt)
    model, distill_ts = _distill_sidecar(model, args.ckpt)
    enc = _build_cond_encoder(
        cfg, model, allow_debug=getattr(args, "debug_encoder", False)
    )
    model, params, put_batch = _tp_shard(
        model, params, getattr(args, "tp", 1), batch_size=args.batch)
    samp = cfg.get("sampling") or {}
    if distill_ts is not None:
        pipe = GenerationPipeline(
            model, num_steps=len(distill_ts), eta=0.0, timesteps=distill_ts)
    else:
        pipe = GenerationPipeline(
            model, num_steps=args.steps or samp.get("ddim_steps", 200),
            eta=samp.get("eta", 1.0),
            sampler=getattr(args, "sampler", None) or samp.get("sampler", "ddim"),
            schedule_method=getattr(args, "schedule", None)
            or samp.get("schedule", "uniform"),
        )
    # per-variant eval crop: 256x176 for the 256px models, 512x352 for the
    # 512 stages (reference model params crop_size, e.g. mm_512/config.yaml:15)
    crop_hw = tuple((cfg.get("eval") or {}).get("crop_size") or (256, 176))
    loaders = _loaders(cfg, args.batch)
    loader = loaders.get("test") or loaders["validation"]
    results = Path(args.out)
    # VAE roundtrip for the recon group (reference log_images returns
    # `reconstruction`, ddpm.py:1389-1393; mode() for determinism)
    recon_fn = jax.jit(lambda p, x: model.decode_first_stage(
        p, model.encode_first_stage_mode(p, x)))
    n = 0
    for raw in loader.epoch(0):
        batch = enc.encode_batch(raw)
        dev = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
        dev = put_batch(dev)
        imgs = np.asarray(pipe.generate(params, dev, jax.random.PRNGKey(n)))
        fnames = raw.get("fname", [f"img{n + i}" for i in range(len(imgs))])
        gt = np.asarray(raw["image"])
        extra = {"recon": np.asarray(recon_fn(params, jnp.asarray(gt)))}
        for src_key, group in (("src_image", "src"), ("smpl_image", "smpl")):
            if src_key in raw:
                extra[group] = np.asarray(raw[src_key])
        dump_test_results(
            str(results), fnames, imgs, gt=gt, extra=extra,
            styles=raw.get("styles"), make_concats=True, crop_hw=crop_hw,
        )
        n += len(imgs)
        if args.max_images and n >= args.max_images:
            break
    metrics = evaluate_dirs(str(results), crop_hw=crop_hw,
                            fid_feature_fn=_fid_fn(cfg, args))
    print(json.dumps(metrics))
    # machine-readable aggregate next to the per-image metrics.csv, so
    # callers (bringup FID gate) don't have to scrape stdout
    (results / "metrics.json").write_text(json.dumps(metrics, indent=2))


def cmd_train_vae(cfg, args):
    """First-stage VAE training (reference: main.py with an autoencoder
    config; loss = contperceptual.LPIPSWithDiscriminator)."""
    import jax
    import jax.numpy as jnp

    from upgpt_tpu.training.train_state import scaled_learning_rate
    from upgpt_tpu.training.vae_loss import LPIPSWithDiscriminator, VAELossConfig
    from upgpt_tpu.training.vae_trainer import make_vae_optimizers, vae_train_step

    vae = instantiate_from_config(cfg["model"])
    tc = cfg.get("trainer") or {}
    loss_cfg = VAELossConfig(**(cfg.get("loss") or {}))
    loss_mod = LPIPSWithDiscriminator(loss_cfg)  # lpips_fn pluggable w/ weights

    key = jax.random.PRNGKey(tc.get("seed", 42))
    loaders = _loaders(cfg, tc.get("batch_size", 12))
    train_loader = loaders["train"]
    sample = next(train_loader.epoch(0))
    img_hw = sample["image"].shape[1:3]

    params = vae.init(key, jnp.asarray(sample["image"]), key)["params"]
    loss_params = loss_mod.init_params(jax.random.PRNGKey(1), image_hw=img_hw)
    lr = scaled_learning_rate(
        tc.get("base_learning_rate", 4.5e-6), tc.get("batch_size", 12),
        len(jax.devices()), scale_lr=tc.get("scale_lr", True),
    )
    opts = make_vae_optimizers(lr)
    opt_states = (opts[0].init(params), opts[1].init(loss_params["disc"]))

    step_fn = jax.jit(
        lambda p, lp, os, b, k, s: vae_train_step(vae, loss_mod, p, lp, opts, os, b, k, s)
    )
    logdir = Path(tc.get("logdir", "logs/vae"))
    logdir.mkdir(parents=True, exist_ok=True)
    step = 0
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    for epoch in range(tc.get("max_epochs", 100)):
        for raw in train_loader.epoch(epoch):
            batch = jnp.asarray(raw["image"])
            key, k = jax.random.split(key)
            params, loss_params, opt_states, logs = step_fn(
                params, loss_params, opt_states, batch, k, step
            )
            step += 1
            if step % tc.get("log_every", 50) == 0:
                print(json.dumps({"step": step,
                                  **{kk: float(v) for kk, v in logs.items()
                                     if hasattr(v, "item")}}))
        ckptr.save((logdir / "last").absolute(),
                   jax.device_get({"params": params, "loss": loss_params}),
                   force=True)
        ckptr.wait_until_finished()
        if tc.get("max_steps") and step >= tc["max_steps"]:
            break
    print(f"done at step {step}; checkpoints in {logdir}")


def _fid_fn(cfg, args):
    """Protocol-FID extractor from --fid-weights / eval.fid_weights:
    pytorch_fid's InceptionV3 pool3 features (reference
    scripts/eval_metrics.py:100-112). `.pth` files go through the torch
    converter; an orbax dir (pre-converted, e.g. by tests) loads directly."""
    fid_weights = getattr(args, "fid_weights", None) or (
        cfg.get("eval") or {}).get("fid_weights")
    if not fid_weights:
        return None
    from upgpt_tpu.eval.inception import InceptionFeatureFn, load_pt_inception

    if Path(fid_weights).is_dir():
        import orbax.checkpoint as ocp

        params = ocp.StandardCheckpointer().restore(
            Path(fid_weights).absolute())
    else:
        params = load_pt_inception(fid_weights)
    return InceptionFeatureFn(params)


def cmd_eval(cfg, args):
    from upgpt_tpu.eval.harness import evaluate_dirs

    print(json.dumps(evaluate_dirs(args.dir, fid_feature_fn=_fid_fn(cfg, args))))


def cmd_convert(cfg, args):
    import orbax.checkpoint as ocp

    from upgpt_tpu.convert.torch_to_jax import (
        convert_linear_project_state_dict, convert_unet_state_dict,
        convert_vae_state_dict, split_ldm_checkpoint,
    )
    from upgpt_tpu.models.unet import UNetConfig
    from upgpt_tpu.models.vae import AutoencoderConfig

    buckets = split_ldm_checkpoint(args.torch_ckpt)
    variant = args.variant
    if variant == "upscale":
        unet_cfg = UNetConfig.upscale_512()
        vae_cfg = AutoencoderConfig.kl_f4()
    elif variant == "tiny":  # CI geometry (zoo 'tiny')
        unet_cfg = UNetConfig(
            in_channels=5, model_channels=32, out_channels=4, num_res_blocks=1,
            attention_resolutions=(1, 2), channel_mult=(1, 2), num_heads=4,
            context_dim=768,
        )
        vae_cfg = AutoencoderConfig(
            embed_dim=4, z_channels=4, ch=32, ch_mult=(1, 2), num_res_blocks=1,
            resolution=64,
        )
    else:
        unet_cfg = UNetConfig.interp_256()
        vae_cfg = AutoencoderConfig.kl_f8()
    out = {}
    if "unet" in buckets:
        unet_sd = buckets["unet"]
        if getattr(args, "ema", False):
            from upgpt_tpu.convert.torch_to_jax import ema_unet_state_dict

            ema_sd = ema_unet_state_dict(buckets)
            if ema_sd is None:
                raise SystemExit("--ema: checkpoint has no model_ema shadow")
            unet_sd = ema_sd
        out["unet"] = convert_unet_state_dict(unet_sd, unet_cfg)
    if "vae" in buckets:
        out["vae"] = convert_vae_state_dict(buckets["vae"], vae_cfg)
    for k in buckets:
        if k.startswith("extra_cond") and any(
            "weight" in kk for kk in buckets[k]
        ):
            sd = buckets[k]
            if "model.weight" in sd and sd["model.weight"].shape == (768, 85):
                out["pose"] = convert_linear_project_state_dict(sd)
    cond_sd = buckets.get("cond_stage") or {}
    if any(kk.startswith("cross_att.") for kk in cond_sd):
        # inshop_laion_clip's trainable fusion (cond_stage_key_2 route)
        from upgpt_tpu.convert.torch_to_jax import convert_cond_fusion_state_dict

        out["cond_fusion"] = convert_cond_fusion_state_dict(cond_sd)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(args.out).absolute(), out, force=True)
    ckptr.wait_until_finished()
    print(f"converted {sorted(out)} -> {args.out}")


def _distill_sidecar(model, ckpt_path):
    """(model, timesteps|None) honoring a distilled-student sidecar.

    `cli distill` writes `<ckpt>.distill.json` next to the checkpoint with
    the student's parameterization and its nested t-grid
    (training/distill.py) — a student is only valid on the exact grid it
    was trained on, so sample/serve must rebuild the model (v-param) and
    pin the grid instead of trusting --steps/--sampler."""
    sidecar = Path(str(Path(ckpt_path).absolute()) + ".distill.json")
    if not sidecar.exists():
        return model, None
    import dataclasses

    import numpy as np

    from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion

    meta = json.loads(sidecar.read_text())
    model = LatentDiffusion(dataclasses.replace(
        model.config, parameterization=meta["parameterization"]))
    ts = np.asarray(meta["timesteps"], dtype=np.int64)
    print(f"distilled student: {meta['parameterization']}-param, "
          f"{len(ts)}-step grid {ts.tolist()}", file=sys.stderr)
    return model, ts


def cmd_distill(cfg, args):
    """Progressive distillation (training/distill.py): halve a trained
    teacher's sampling steps repeatedly (64 -> ... -> 4) and save the
    few-step v-parameterized student + its grid sidecar, ready for
    `cli sample`/`cli serve`. No reference counterpart (it serves DDIM-200,
    app.py:55) — this is the post-rho-sweep serving lever."""
    import dataclasses

    import jax

    from upgpt_tpu.training.distill import DistillConfig, progressive_distill

    model = instantiate_from_config(cfg["model"])
    all_params = _restore_params(model, args.teacher_ckpt)
    frozen = {"vae": all_params.pop("vae")}

    if args.synthetic:
        from upgpt_tpu.data.synthetic import SyntheticPairs

        ds = SyntheticPairs.for_model(model.config, n_samples=384,
                                      split="train")
        data_iter = ds.iterator(args.batch, seed=3)
    else:
        import itertools

        import jax.numpy as jnp

        enc = _build_cond_encoder(
            cfg, model, allow_debug=getattr(args, "debug_encoder", False))
        loaders = _loaders(cfg, args.batch)

        def gen():
            for epoch in itertools.count():
                for raw in loaders["train"].epoch(epoch):
                    bt = enc.encode_batch(raw)
                    yield {k: jnp.asarray(v) for k, v in bt.items()
                           if not isinstance(v, list)}

        data_iter = gen()

    dcfg = DistillConfig(
        start_steps=args.start_steps, end_steps=args.end_steps,
        steps_per_stage=args.stage_steps, learning_rate=args.lr,
        grid_method=args.grid, use_ema=True, ema_decay=args.ema_decay,
        adapt_steps=args.adapt_steps)
    student, s_params, grid, hist = progressive_distill(
        model, all_params, frozen, data_iter, dcfg,
        rng=jax.random.PRNGKey(args.seed),
        log_fn=lambda s: print(s, file=sys.stderr, flush=True))

    import orbax.checkpoint as ocp

    out = Path(args.out).absolute()
    payload = {**jax.device_get(s_params), "vae": jax.device_get(frozen["vae"])}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, payload, force=True)
    ckptr.wait_until_finished()
    with open(str(out) + ".distill.json", "w") as f:
        json.dump({"parameterization": student.config.parameterization,
                   "timesteps": [int(t) for t in grid],
                   "history": hist}, f, indent=2)
    print(json.dumps({"out": str(out), "steps": len(grid),
                      "stages": [h["steps"] for h in hist],
                      "final_loss": hist[-1]["loss"] if hist else None}))


def _xla_path_model(model):
    """Rebuild a model with the Pallas-kernel flags off: the fused kernels
    are per-device programs GSPMD cannot partition, so any mesh-sharded
    path (--tp, --dp) runs the XLA attention/GN lowering instead."""
    import dataclasses

    from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion

    cfg = dataclasses.replace(
        model.config,
        unet=dataclasses.replace(
            model.config.unet, use_flash_attention=False,
            use_fused_groupnorm=False, use_fused_transformer=False,
        ),
    )
    return LatentDiffusion(cfg)


def _build_serving(cfg, args):
    """(engine, builder, label) for `cli serve` — factored out so tests can
    drive the construction (incl. --dp) without the blocking HTTP loop."""
    import jax
    import jax.numpy as jnp

    from upgpt_tpu.inference.http_serve import RequestBuilder
    from upgpt_tpu.inference.pipeline import GenerationPipeline
    from upgpt_tpu.inference.serving import ServingEngine
    from upgpt_tpu.utils.diagnostics import cast_floating

    on_accel = jax.devices()[0].platform != "cpu"
    model = instantiate_from_config(cfg["model"])
    params = _restore_params(model, args.ckpt)
    model, distill_ts = _distill_sidecar(model, args.ckpt)
    enc = _build_cond_encoder(
        cfg, model, allow_debug=getattr(args, "debug_encoder", False))
    if on_accel:
        params = cast_floating(params, jnp.bfloat16)
    dp = getattr(args, "dp", 1) or 1
    mesh = None
    if dp > 1:
        # data-parallel serving: one replicated program, batches sharded
        # over the mesh's data axis (reference equivalent: none — its app
        # is single-GPU; DDP is training-only, main.py:581)
        from upgpt_tpu.parallel.mesh import create_mesh

        n_dev = len(jax.devices())
        if dp > n_dev:
            raise SystemExit(f"--dp {dp} exceeds {n_dev} devices")
        mesh = create_mesh((dp, 1), devices=jax.devices()[:dp])
        model = _xla_path_model(model)
    samp = cfg.get("sampling") or {}
    steps = args.steps or samp.get("ddim_steps", 50)
    sampler = args.sampler or samp.get("sampler", "ddim")
    sched_method = (getattr(args, "schedule", None)
                    or samp.get("schedule", "uniform"))
    if args.upscale_base:
        # chained 256->512: one submit -> 512px result through both stages
        from upgpt_tpu.inference.pipeline import ChainedUpscalePipeline

        up_cfg = merge_configs(args.upscale_base, [])
        up_model = instantiate_from_config(up_cfg["model"])
        up_params = _restore_params(up_model, args.upscale_ckpt)
        if on_accel:
            up_params = cast_floating(up_params, jnp.bfloat16)
        if mesh is not None:
            up_model = _xla_path_model(up_model)
        pipe = ChainedUpscalePipeline(
            model, up_model, num_steps=steps, eta=samp.get("eta", 1.0),
            sampler=sampler, output_uint8=True,
            schedule_method=sched_method)
        params = {"base": params, "up": up_params}
        label = f"chained {sampler}-{steps}"
    elif distill_ts is not None:
        # distilled student (sidecar): serve on its trained grid, eta 0
        pipe = GenerationPipeline(
            model, num_steps=len(distill_ts), eta=0.0,
            timesteps=distill_ts, output_uint8=True)
        label = f"distilled-{len(distill_ts)}"
    else:
        pipe = GenerationPipeline(
            model,
            num_steps=steps,
            eta=samp.get("eta", 1.0),
            guidance_scale=samp.get("guidance_scale", 1.0),
            sampler=sampler,
            output_uint8=True,
            schedule_method=sched_method,
        )
        label = f"{sampler}-{steps}"
    if mesh is not None:
        label += f" dp{mesh.shape['data']}"
    engine = ServingEngine(
        pipe, params, batch_size=args.batch, max_delay_s=args.max_delay,
        base_seed=args.seed, mesh=mesh,
        max_in_flight=getattr(args, "in_flight", 2))
    builder = RequestBuilder(
        enc, mask_hw=tuple(model.config.latent_size),
        context_dim=model.config.context_dim,
        pose_dim=model.config.pose_input_dim)
    return engine, builder, label


def cmd_serve(cfg, args):
    """Production HTTP daemon: concurrent requests batch into full
    static-shape device programs through the ServingEngine (no reference
    counterpart — its app serves one request at a time, app.py:262-278)."""
    from upgpt_tpu.inference.http_serve import serve

    engine, builder, label = _build_serving(cfg, args)
    engine.start()
    server = serve(engine, builder, port=args.port, host=args.host)
    print(f"serving on {args.host}:{server.server_address[1]} "
          f"(batch {args.batch}, {label})", file=sys.stderr, flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        engine.stop()
        print(json.dumps(engine.stats.summary()), file=sys.stderr)


def cmd_bringup(cfg, args):
    """Weight-drop runbook (upgpt_tpu/bringup.py): inventory -> convert
    (EMA) -> self-validating smoke checks -> bench -> FID/LPIPS eval, one
    acceptance report. First contact with the released weights should be
    this command, not an interactive session (BASELINE.md build targets)."""
    from upgpt_tpu.bringup import run_bringup

    report = run_bringup(
        args.drop, args.out,
        variants=args.variants or None,
        data_root=args.data_root,
        skip_bench=args.skip_bench,
        skip_eval=args.skip_eval,
        geometry_override=args.geometry or None,
        fid_reference=args.fid_reference,
        skip_sampler_check=args.skip_sampler_check,
    )
    print(json.dumps({"accepted": report["accepted"],
                      "report": str(Path(args.out) / "REPORT.md")}))
    if not report["accepted"]:
        raise SystemExit(3)


def cmd_data_verify(cfg, args):
    """Real-data readiness drill (upgpt_tpu/data/verify.py): validate a
    DeepFashion root's CSV schemas, caption keys, SMPL pickles and tree
    completeness before the first run. With --base, the dataset paths come
    from the config's data.train entry; flags override."""
    from upgpt_tpu.data.verify import verify_root

    params = {}
    if cfg:
        split = (cfg.get("data") or {}).get(args.split) or {}
        params = dict(split.get("params") or {})
    kw = dict(
        root=args.root or params.get("folder"),
        image_dir=args.image_dir or params.get("image_dir", "img_256"),
        pair_files=args.pair_file or params.get(
            "pair_file", ["data/deepfashion/pairs-test-all.csv"]),
        data_file=args.data_file or params.get(
            "data_file", "data/deepfashion/deepfashion_map.csv"),
        input_mask_type=params.get("input_mask_type", "bbox"),
        check_loss_weight=bool(params.get("loss_weight", True)),
        limit=args.limit,
    )
    if not kw["root"]:
        raise SystemExit("--root (or a --base config with data paths) required")
    if isinstance(kw["pair_files"], str):
        kw["pair_files"] = [kw["pair_files"]]
    report = verify_root(**kw)
    print(json.dumps(report, indent=2))
    if not report["ok"]:
        raise SystemExit(2)


def main(argv=None):
    p = argparse.ArgumentParser("upgpt_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("train", "train-vae", "sample", "test", "eval", "convert",
                 "serve", "bringup", "data-verify", "distill"):
        sp = sub.add_parser(name)
        sp.add_argument("--base", nargs="*", default=[])
        sp.add_argument("overrides", nargs="*", help="key=value dotlist")
        if name in ("train", "sample", "test", "serve"):
            sp.add_argument("--debug-encoder", action="store_true",
                            help="allow hash-embedding conditioning (no CLIP "
                                 "weights; NOT output parity)")
        if name == "train":
            sp.add_argument("--resume", action="store_true")
            sp.add_argument("--finetune-from", default=None,
                            help="checkpoint to load weights from (fresh opt state)")
            sp.add_argument("--multihost", action="store_true",
                            help="join a multi-host (TPU pod / multi-node) "
                                 "run via jax.distributed.initialize; every "
                                 "host runs this same command (the "
                                 "reference's Trainer num_nodes equivalent)")
        if name in ("sample", "test"):
            sp.add_argument("--ckpt", required=True)
            sp.add_argument("--out", default="results")
            sp.add_argument("--steps", type=int, default=None)
            sp.add_argument("--batch", type=int, default=8)
            sp.add_argument("--seed", type=int, default=0)
            sp.add_argument("--max-images", type=int, default=None)
            sp.add_argument("--sampler", default=None,
                            choices=("ddim", "dpm++", "unipc"),
                            help="ddim (reference protocol), dpm++ "
                                 "(DPM-Solver++(2M): comparable quality in "
                                 "~2.5x fewer steps, e.g. --steps 20) or "
                                 "unipc (UniPC-2: ~10 steps)")
            sp.add_argument("--schedule", default=None,
                            choices=("uniform", "quad", "karras"),
                            help="t-grid: uniform/quad (reference grids) or "
                                 "karras (low-step spacing for the ODE "
                                 "solvers; concentrates steps at low noise)")
            sp.add_argument("--tp", type=int, default=1,
                            help="tensor-parallel degree: shard the U-Net's "
                                 "transformer matmuls over a (data x model) "
                                 "mesh (parallel/tp.py); batch still shards "
                                 "over the data axis")
        if name in ("eval", "test"):
            sp.add_argument("--fid-weights", default=None,
                            help="pt_inception .pth (or converted orbax dir) "
                                 "for protocol-exact FID")
        if name == "eval":
            sp.add_argument("--dir", required=True)
        if name == "serve":
            sp.add_argument("--ckpt", required=True)
            sp.add_argument("--port", type=int, default=8000)
            sp.add_argument("--host", default="0.0.0.0")
            sp.add_argument("--batch", type=int, default=32)
            sp.add_argument("--steps", type=int, default=None)
            sp.add_argument("--seed", type=int, default=0)
            sp.add_argument("--max-delay", type=float, default=0.25,
                            help="batching window (s): tail latency traded "
                                 "for batch occupancy")
            sp.add_argument("--in-flight", type=int, default=2,
                            help="dispatched-but-unfenced batch depth; 2 "
                                 "overlaps host dispatch with device "
                                 "compute (essential at <=10-step "
                                 "samplers), 1 = round-3 behavior")
            sp.add_argument("--dp", type=int, default=1,
                            help="data-parallel serving over N devices: one "
                                 "replicated program, batches sharded over "
                                 "the mesh data axis (batch must divide)")
            sp.add_argument("--sampler", default=None,
                            choices=("ddim", "dpm++", "unipc"))
            sp.add_argument("--schedule", default=None,
                            choices=("uniform", "quad", "karras"))
            sp.add_argument("--upscale-base", nargs="*", default=None,
                            help="upscale-stage config: serve the chained "
                                 "256->512 pipeline (one submit per 512px "
                                 "result)")
            sp.add_argument("--upscale-ckpt", default=None)
        if name == "convert":
            sp.add_argument("--torch-ckpt", required=True)
            sp.add_argument("--out", required=True)
            sp.add_argument("--variant", default="interp_256")
            sp.add_argument("--ema", action="store_true",
                            help="convert the model_ema shadow weights "
                                 "(the released eval protocol, ema_scope)")
        if name == "data-verify":
            sp.add_argument("--root", default=None,
                            help="DeepFashion root (defaults to the config's "
                                 "data.<split>.params.folder)")
            sp.add_argument("--split", default="train")
            sp.add_argument("--image-dir", default=None)
            sp.add_argument("--pair-file", nargs="*", default=None)
            sp.add_argument("--data-file", default=None)
            sp.add_argument("--limit", type=int, default=None,
                            help="check only the first N pair rows")
        if name == "distill":
            sp.add_argument("--teacher-ckpt", required=True,
                            help="trained teacher (convert layout or "
                                 "trainer ckpt; EMA preferred)")
            sp.add_argument("--out", required=True,
                            help="student checkpoint dir (a .distill.json "
                                 "grid sidecar is written next to it)")
            sp.add_argument("--start-steps", type=int, default=64,
                            help="top teacher sampling grid (power-of-2 "
                                 "multiple of --end-steps)")
            sp.add_argument("--end-steps", type=int, default=4)
            sp.add_argument("--stage-steps", type=int, default=2000,
                            help="optimizer steps per halving stage")
            sp.add_argument("--lr", type=float, default=2e-4)
            sp.add_argument("--batch", type=int, default=32)
            sp.add_argument("--grid", default="karras",
                            choices=("uniform", "karras"),
                            help="ladder t-grid; karras measured round 5: "
                                 "the uniform 64-grid teacher trajectory "
                                 "is already below the DDIM-50 bar, "
                                 "karras is above it from 8 steps up")
            sp.add_argument("--ema-decay", type=float, default=0.999)
            sp.add_argument("--adapt-steps", type=int, default=400,
                            help="eps->v re-parameterization fit before "
                                 "the first halving stage")
            sp.add_argument("--seed", type=int, default=0)
            sp.add_argument("--synthetic", action="store_true",
                            help="distill on the procedural synthetic "
                                 "dataset (no data root needed)")
            sp.add_argument("--debug-encoder", action="store_true")
        if name == "bringup":
            sp.add_argument("--drop", required=True,
                            help="directory with the released ckpts + CLIP "
                                 "+ LPIPS + pt_inception files")
            sp.add_argument("--out", default="bringup")
            sp.add_argument("--data-root", default=None,
                            help="DeepFashion root for the FID/LPIPS gate")
            sp.add_argument("--variants", nargs="*", default=None)
            sp.add_argument("--geometry", default=None,
                            help="override converter geometry (rehearsals "
                                 "use 'tiny')")
            sp.add_argument("--skip-bench", action="store_true")
            sp.add_argument("--skip-eval", action="store_true")
            sp.add_argument("--skip-sampler-check", action="store_true",
                            help="skip the DDIM-200-vs-fast-sampler "
                                 "ordering check on converted weights")
            sp.add_argument("--fid-reference", type=float, default=None,
                            help="FID from the REFERENCE's own eval run on "
                                 "the same pairs; gates acceptance at "
                                 "within-2% (BASELINE.md build target)")
    args = p.parse_args(argv)
    if getattr(args, "multihost", False):
        # must run before the first backend touch (jax.devices())
        from upgpt_tpu.parallel.multihost import initialize

        initialize()
    from upgpt_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()  # warm process restarts skip the 1-10 min compile
    cfg = merge_configs(args.base, args.overrides) if args.base else {}
    {"train": cmd_train, "train-vae": cmd_train_vae, "sample": cmd_sample,
     "test": cmd_test, "eval": cmd_eval, "convert": cmd_convert,
     "serve": cmd_serve, "bringup": cmd_bringup,
     "data-verify": cmd_data_verify, "distill": cmd_distill}[args.cmd](cfg, args)


if __name__ == "__main__":
    main()
