"""Train-loop throughput WITH the real input pipeline (VERDICT item 5 check).

Synthesizes a DeepFashion-format tree (JPEG images, SMPL pickles, segm
maps), feeds it through DeepFashionPair + PrefetchDataLoader (thread-pool
decode, bounded prefetch) into the donated-state train step, and reports
img/s with real host-side decoding — to be compared against
bench_train.py's synthetic-batch number (acceptance: within 10%).

Conditioning uses the DebugConditioningEncoder (no CLIP weights in this
sandbox); its cost is negligible either way, and the overlap mechanics the
item targets (decode vs device step) are exercised identically.

Usage: python benchmarks/bench_train_loader.py [batch] [n_images]
"""

import json
import os
import pickle
import sys
import tempfile
import time
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tree(root: Path, n_images: int, n_pairs: int) -> None:
    (root / "img_256").mkdir(parents=True)
    (root / "smpl_256").mkdir()
    (root / "segm_256").mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(n_images):
        name = f"MEN/id_{i:05d}_front.jpg"
        names.append(name)
        p = root / "img_256" / name
        p.parent.mkdir(exist_ok=True, parents=True)
        Image.fromarray(rng.integers(0, 255, (256, 192, 3), np.uint8)).save(p)
        Image.fromarray(rng.integers(0, 255, (256, 192, 3), np.uint8)).save(
            root / "smpl_256" / f"pose{i}.jpg")
        mask = np.zeros((256, 192), np.uint8)
        mask[40:200, 50:150] = 255
        Image.fromarray(mask).save(root / "smpl_256" / f"pose{i}_mask.png")
        with open(root / "smpl_256" / f"pose{i}.p", "wb") as f:
            pickle.dump([{
                "pred_body_pose": rng.normal(size=(1, 72)).astype(np.float32),
                "pred_betas": rng.normal(size=(1, 10)).astype(np.float32),
                "pred_camera": rng.normal(size=(3,)).astype(np.float32),
            }], f)
        segm = np.zeros((256, 192), np.uint8)
        segm[10:60, 60:120] = 14
        segm[60:200, 50:140] = 15
        sp = root / "segm_256" / name.replace(".jpg", "_segm.png")
        sp.parent.mkdir(exist_ok=True, parents=True)
        Image.fromarray(segm).save(sp)
        sd = root / "styles" / f"s{i}"
        sd.mkdir(parents=True)
        for slot in ("face", "top"):
            Image.fromarray(
                rng.integers(0, 255, (224, 224, 3), np.uint8)
            ).save(sd / f"{slot}.jpg")

    with open(root / "captions.json", "w") as f:
        json.dump({f"t{i}": f"person {i}" for i in range(n_images)}, f)
    import csv
    with open(root / "map.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image", "text", "pose", "styles"])
        w.writeheader()
        for i, name in enumerate(names):
            w.writerow({"image": name, "text": f"t{i}", "pose": f"pose{i}",
                        "styles": f"s{i}"})
    with open(root / "pairs.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["from", "to"])
        w.writeheader()
        for i in range(n_pairs):
            w.writerow({"from": names[i % n_images],
                        "to": names[(i * 7 + 3) % n_images]})


def main():
    import jax
    import jax.numpy as jnp

    from upgpt_tpu.data.deepfashion import DeepFashionPair, PrefetchDataLoader
    from upgpt_tpu.diffusion.latent_diffusion import (
        LatentDiffusion, LatentDiffusionConfig,
    )
    from upgpt_tpu.inference.encoders import DebugConditioningEncoder
    from upgpt_tpu.models.unet import UNetConfig
    from upgpt_tpu.models.vae import AutoencoderConfig
    from upgpt_tpu.training.train_state import create_train_state, train_step

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_pairs = 40 * batch

    tmp = Path(tempfile.mkdtemp(prefix="dfbench_"))
    t0 = time.perf_counter()
    make_tree(tmp, n_images, n_pairs)
    print(f"tree: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    loader_kind = sys.argv[3] if len(sys.argv) > 3 else "prefetch"
    ds = DeepFashionPair(
        folder=str(tmp), image_dir="img_256",
        pair_file=[str(tmp / "pairs.csv")], data_file=str(tmp / "map.csv"),
        image_size=(256, 192), f=8, input_mask_type="bbox", compact=True,
    )
    enc = DebugConditioningEncoder()
    from upgpt_tpu.training.trainer import decode_transport, encode_transport

    keep = ("image", "person_mask", "text_emb", "style_emb", "smpl", "loss_w")

    def host_transform(raw):
        # runs in the loader's producer thread (overlaps the device step):
        # conditioning encode + compact transport pack — mirrors
        # Trainer.host_encode
        eb = enc.encode_batch(raw)
        return encode_transport({k: v for k, v in eb.items() if k in keep})

    if loader_kind == "process":
        from upgpt_tpu.data.deepfashion import ProcessDataLoader

        loader = ProcessDataLoader(ds, batch_size=batch, shuffle=True,
                                   prefetch_batches=3,
                                   batch_transform=host_transform)
    else:
        loader = PrefetchDataLoader(ds, batch_size=batch, shuffle=True,
                                    prefetch_batches=3,
                                    batch_transform=host_transform)

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = LatentDiffusionConfig.interp_256(
        unet=UNetConfig.interp_256(
            dtype=dtype, use_flash_attention=on_tpu,
            use_fused_groupnorm=on_tpu, use_fused_transformer=on_tpu,
        ),
        vae=AutoencoderConfig.kl_f8(dtype=dtype, use_flash_attention=on_tpu),
    )
    model = LatentDiffusion(cfg)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    frozen = {"vae": params.pop("vae")}
    state = create_train_state(params, learning_rate=2e-6, use_ema=True)
    key = jax.random.PRNGKey(1)

    step_fn = jax.jit(
        lambda s, bt: train_step(model, s, frozen, decode_transport(bt), key),
        donate_argnums=0)

    def device_batch(pre):
        # loader already encoded + packed (batch_transform); just transfer
        return {k: jnp.asarray(v) for k, v in pre.items()}

    from upgpt_tpu.training.trainer import transfer_prefetch

    it = transfer_prefetch(loader.epoch(0), device_batch)
    state, metrics = step_fn(state, next(it))
    print(f"compile done, loss {float(metrics['loss']):.4f}", file=sys.stderr)

    # epoch 0 = warmup (absorbs worker-pool spawn ramp); epoch 1 is timed
    for b in it:
        state, _ = step_fn(state, b)
    np.asarray(state.step)
    n = 0
    t0 = time.perf_counter()
    for b in transfer_prefetch(loader.epoch(1), device_batch):
        state, metrics = step_fn(state, b)
        n += 1
    np.asarray(metrics["loss"])
    dt = time.perf_counter() - t0
    print(f"train+loader batch={batch} [{loader_kind}, compact]: "
          f"{dt/n*1000:.1f} ms/step over {n} steps, {n*batch/dt:.1f} img/s "
          f"(real JPEG decode)")
    if loader_kind == "process":
        loader.close()


if __name__ == "__main__":
    main()
