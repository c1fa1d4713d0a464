"""Example: per-slot text<->image style mixing (inference-mix.ipynb /
app mix flow; reference generate_utils.py:172-190).

Takes a source image's 9-slot style stack, overrides chosen slots with pooled
CLIP text embeddings (e.g. top='red shirt'), optionally empties others, then
samples. Slot names: face hair headwear background top outer bottom shoes
accesories.
"""

import argparse
import json

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
    p.add_argument("--style-texts", default="{}",
                   help='JSON: {"top": "red shirt", ...}')
    p.add_argument("--drop-slots", nargs="*", default=[])
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--out", default="mixed.jpg")
    p.add_argument("--debug-encoder", action="store_true",
                   help="hash-embedding conditioning (no CLIP weights)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from upgpt_tpu.cli import _build_cond_encoder, _restore_params
    from upgpt_tpu.config import instantiate_from_config, merge_configs
    from upgpt_tpu.data.deepfashion import DeepFashionPair, collate
    from upgpt_tpu.data.transforms import CLIP_MEAN, CLIP_STD
    from upgpt_tpu.inference.pipeline import (
        STYLE_NAMES, GenerationPipeline, mix_style,
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
    ds.rows = [{"from": args.src, "to": args.src}]
    batch = enc.encode_batch(collate([ds[0]]))

    overrides = json.loads(args.style_texts)
    texts = [overrides.get(n, "") for n in STYLE_NAMES]
    pooled = np.asarray(enc.text_pooled(texts))[None]
    flags = [bool(overrides.get(n)) for n in STYLE_NAMES]
    drop = [STYLE_NAMES.index(n) for n in args.drop_slots]
    # empty-style embedding = encoder of the CLIP-normalized zeros image
    empty_img = np.broadcast_to(
        (-CLIP_MEAN / CLIP_STD), (1, 1, 224, 224, 3)
    ).astype(np.float32)
    empty_emb = np.asarray(enc.style_embeddings(empty_img))[0, 0]

    style_emb = mix_style(
        jnp.asarray(batch["style_emb"]), jnp.asarray(pooled), flags,
        drop_slots=drop, empty_style_emb=jnp.asarray(empty_emb),
    )
    dev = {
        "text_emb": jnp.asarray(batch["text_emb"]),
        "style_emb": style_emb,
        "smpl": jnp.asarray(batch["smpl"]),
        "person_mask": jnp.asarray(batch["person_mask"]),
    }
    pipe = GenerationPipeline(model, num_steps=args.steps, eta=1.0)
    img = np.asarray(pipe.generate(params, dev, jax.random.PRNGKey(0)))[0]
    Image.fromarray((np.clip((img + 1) / 2, 0, 1) * 255).astype(np.uint8)).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
