"""Example: single 256px pose transfer (the inference.ipynb flow).

Loads a model + checkpoint, takes a source image's style stack and a target
SMPL pose, runs DDIM and writes the sample. With converted reference weights
this reproduces the released model's behavior; without weights it runs the
plumbing with the debug encoder.

    python examples/pose_transfer.py --base configs/deepfashion/interp_256.yaml \
        --ckpt weights/interp_256 --folder /data/deepfashion_inshop \
        --src MEN/...jpg --pose-of WOMEN/...jpg --out sample.jpg
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base", nargs="*", default=["configs/deepfashion/interp_256.yaml"])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--folder", required=True)
    p.add_argument("--image-dir", default="img_256")
    p.add_argument("--image-size", type=int, nargs=2, default=[256, 192])
    p.add_argument("--f", type=int, default=8, dest="downsample",
                   help="latent downsample factor of the first stage")
    p.add_argument("--data-file", required=True)
    p.add_argument("--src", required=True, help="source image id (style donor)")
    p.add_argument("--pose-of", required=True, help="image id whose pose to take")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--out", default="sample.jpg")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--debug-encoder", action="store_true",
                   help="hash-embedding conditioning (no CLIP weights)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from upgpt_tpu.cli import _build_cond_encoder, _restore_params
    from upgpt_tpu.config import instantiate_from_config, merge_configs
    from upgpt_tpu.data.deepfashion import DeepFashionPair, collate
    from upgpt_tpu.inference.pipeline import GenerationPipeline

    cfg = merge_configs(args.base)
    model = instantiate_from_config(cfg["model"])
    params = _restore_params(model, args.ckpt)
    enc = _build_cond_encoder(cfg, model, allow_debug=args.debug_encoder)

    ds = DeepFashionPair(
        folder=args.folder, image_dir=args.image_dir,
        pair_file=[], data_file=args.data_file, input_mask_type="bbox",
        image_size=tuple(args.image_size), f=args.downsample,
    )
    ds.rows = [{"from": args.src, "to": args.pose_of}]
    batch = enc.encode_batch(collate([ds[0]]))
    dev = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}

    pipe = GenerationPipeline(model, num_steps=args.steps, eta=1.0)
    img = np.asarray(pipe.generate(params, dev, jax.random.PRNGKey(args.seed)))[0]
    Image.fromarray((np.clip((img + 1) / 2, 0, 1) * 255).astype(np.uint8)).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
