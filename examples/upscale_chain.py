"""Example: two-stage 256 -> 512 generation (app.py:379-409 Upscale flow).

Chains the interp_256 sampler output through edge-pad + bilinear resize into
the kl-f4 upscale stage's lr-concat conditioning, producing 512x384 images.
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base-256", nargs="*",
                   default=["configs/deepfashion/interp_256.yaml"])
    p.add_argument("--base-512", nargs="*",
                   default=["configs/deepfashion/upscale.yaml"])
    p.add_argument("--ckpt-256", required=True)
    p.add_argument("--ckpt-512", required=True)
    p.add_argument("--folder", required=True)
    p.add_argument("--data-file", required=True)
    p.add_argument("--image-dir", default="img_256")
    p.add_argument("--image-size", type=int, nargs=2, default=[256, 192])
    p.add_argument("--f", type=int, default=8, dest="downsample",
                   help="latent downsample factor of the 256 stage")
    p.add_argument("--src", required=True)
    p.add_argument("--pose-of", required=True)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--out", default="upscaled.jpg")
    p.add_argument("--debug-encoder", action="store_true",
                   help="hash-embedding conditioning (no CLIP weights)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from upgpt_tpu.cli import _build_cond_encoder, _restore_params
    from upgpt_tpu.config import instantiate_from_config, merge_configs
    from upgpt_tpu.data.deepfashion import DeepFashionPair, collate
    from upgpt_tpu.inference.pipeline import GenerationPipeline, UpscalePipeline

    cfg256 = merge_configs(args.base_256)
    cfg512 = merge_configs(args.base_512)
    m256 = instantiate_from_config(cfg256["model"])
    m512 = instantiate_from_config(cfg512["model"])
    p256 = _restore_params(m256, args.ckpt_256)
    p512 = _restore_params(m512, args.ckpt_512)
    enc = _build_cond_encoder(cfg256, m256, allow_debug=args.debug_encoder)

    ds = DeepFashionPair(
        folder=args.folder, image_dir=args.image_dir, pair_file=[],
        data_file=args.data_file, input_mask_type="bbox",
        image_size=tuple(args.image_size), f=args.downsample,
    )
    ds.rows = [{"from": args.src, "to": args.pose_of}]
    batch = enc.encode_batch(collate([ds[0]]))
    dev = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}

    stage1 = GenerationPipeline(m256, num_steps=args.steps, eta=1.0)
    img256 = stage1.generate(p256, dev, jax.random.PRNGKey(0))

    stage2 = UpscalePipeline(m512, num_steps=args.steps, eta=1.0)
    img512 = np.asarray(stage2.upscale(
        p512, img256, dev["text_emb"], dev.get("style_emb"), jax.random.PRNGKey(1)
    ))[0]
    Image.fromarray(
        (np.clip((img512 + 1) / 2, 0, 1) * 255).astype(np.uint8)
    ).save(args.out)
    print(f"wrote {args.out} ({img512.shape[0]}x{img512.shape[1]})")


if __name__ == "__main__":
    main()
