"""Example: N-frame SMPL pose+camera interpolation sweep
(the inference-interpolation.ipynb / app Interpolate flow, app.py:280-308).

One batched DDIM run: styles/text are shared across frames, SMPL vectors and
person-mask bbox corners are lerped per frame, and the U-Net weights amortize
across the batch lane dimension.
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base", nargs="*", default=["configs/deepfashion/interp_256.yaml"])
    p.add_argument("--ckpt", required=True)
    p.add_argument("--folder", required=True)
    p.add_argument("--data-file", required=True)
    p.add_argument("--image-dir", default="img_256")
    p.add_argument("--image-size", type=int, nargs=2, default=[256, 192])
    p.add_argument("--f", type=int, default=8, dest="downsample",
                   help="latent downsample factor of the first stage")
    p.add_argument("--src", required=True)
    p.add_argument("--pose-a", required=True)
    p.add_argument("--pose-b", required=True)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--out", default="interp")
    p.add_argument("--debug-encoder", action="store_true",
                   help="hash-embedding conditioning (no CLIP weights)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from upgpt_tpu.cli import _build_cond_encoder, _restore_params
    from upgpt_tpu.config import instantiate_from_config, merge_configs
    from upgpt_tpu.data.deepfashion import DeepFashionPair, collate
    from upgpt_tpu.inference.pipeline import (
        GenerationPipeline, interpolate_masks, interpolate_smpl,
    )

    cfg = merge_configs(args.base)
    model = instantiate_from_config(cfg["model"])
    params = _restore_params(model, args.ckpt)
    enc = _build_cond_encoder(cfg, model, allow_debug=args.debug_encoder)

    ds = DeepFashionPair(
        folder=args.folder, image_dir=args.image_dir, pair_file=[],
        data_file=args.data_file, input_mask_type="bbox",
        image_size=tuple(args.image_size), f=args.downsample,
    )
    ds.rows = [{"from": args.src, "to": args.pose_a},
               {"from": args.src, "to": args.pose_b}]
    sa, sb = ds[0], ds[1]
    base = enc.encode_batch(collate([sa]))

    F = args.frames
    alphas = np.linspace(1.0, 0.0, F).astype(np.float32)
    smpl = np.asarray(interpolate_smpl(
        jnp.asarray(sa["smpl"]), jnp.asarray(sb["smpl"]), jnp.asarray(alphas)))
    masks = interpolate_masks(sa["person_mask"], sb["person_mask"], alphas)

    batch = {
        "text_emb": np.repeat(np.asarray(base["text_emb"]), F, 0),
        "style_emb": np.repeat(np.asarray(base["style_emb"]), F, 0),
        "smpl": smpl.reshape(F, 1, -1),
        "person_mask": masks,
    }
    pipe = GenerationPipeline(model, num_steps=args.steps, eta=1.0)
    imgs = np.asarray(pipe.generate(
        params, {k: jnp.asarray(v) for k, v in batch.items()},
        jax.random.PRNGKey(0), shared_x_T=True,
    ))
    for i, img in enumerate(imgs):
        Image.fromarray(
            (np.clip((img + 1) / 2, 0, 1) * 255).astype(np.uint8)
        ).save(f"{args.out}_{i:03d}.jpg")
    print(f"wrote {F} frames to {args.out}_*.jpg")


if __name__ == "__main__":
    main()
