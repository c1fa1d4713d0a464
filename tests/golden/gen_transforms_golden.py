"""Generate tests/golden/transforms_256.npz — full-geometry (256x192)
golden outputs for the conditioning transforms (VERDICT r3 item 6).

The golden arrays are computed HERE with raw PIL/numpy calls that replicate
the reference's torchvision chains literally (torchvision is absent in this
image, but its PIL backend is these exact calls by construction:
T.Resize -> Image.resize(size[::-1], mode), T.ToTensor -> /255,
T.CenterCrop -> the round((d - t)/2) crop box — deepfashion_inshop.py
:137-172, 228-241). The production code in upgpt_tpu/data/transforms.py is
deliberately NOT imported: the fixture is an independent computation, and
tests/test_transforms_golden.py pins the production functions to it so any
future drift in resize mode, rounding, or the /255 bbox bug breaks loudly.

Run from tests/: python golden/gen_transforms_golden.py
"""

from pathlib import Path

import numpy as np
from PIL import Image

HERE = Path(__file__).resolve().parent
LATENT = (32, 24)  # interp_256 latent grid (h, w)


def synth_inputs():
    rng = np.random.default_rng(20260819)
    sil = np.zeros((256, 192), np.uint8)
    sil[37:211, 52:149] = 255           # silhouette blob
    sil[60:80, 60:70] = 0               # hole (nearest-resize sensitive)
    smpl = rng.integers(0, 256, (300, 200, 3), dtype=np.uint8)  # pre-crop
    image = rng.integers(0, 256, (256, 192, 3), dtype=np.uint8)
    style = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
    return sil, smpl, image, style


def main():
    sil, smpl, image, style = synth_inputs()

    # ---- 'mask' RPM: T.Resize(latent, NEAREST) -> ToTensor -> *2-1
    m = Image.fromarray(sil).resize((LATENT[1], LATENT[0]), Image.NEAREST)
    mask_mode = (np.asarray(m, np.float32) / 255.0 * 2.0 - 1.0)[..., None]

    # ---- 'bbox' RPM: get_bbox (deepfashion_inshop.py:164-172) kept at 0/1
    # (the deliberate /255 bug, :232-239) -> same NEAREST chain
    x = np.nonzero(np.mean(sil, 1))[0]
    y = np.nonzero(np.mean(sil, 0))[0]
    bbox = np.zeros_like(sil, np.uint8)
    bbox[x[0]: x[-1] + 1, y[0]: y[-1] + 1] = 1
    b = Image.fromarray(bbox).resize((LATENT[1], LATENT[0]), Image.NEAREST)
    bbox_mode = (np.asarray(b, np.float32) / 255.0 * 2.0 - 1.0)[..., None]

    # ---- 'smpl' RPM: T.CenterCrop(256,192) -> T.Resize(latent, BILINEAR)
    # -> ToTensor -> channel mean -> *2-1
    img = Image.fromarray(smpl)
    w, h = img.size
    left = int(round((w - 192) / 2.0))
    top = int(round((h - 256) / 2.0))
    cropped = img.crop((left, top, left + 192, top + 256))
    s = cropped.resize((LATENT[1], LATENT[0]), Image.BILINEAR)
    s = np.asarray(s, np.float32) / 255.0
    smpl_mode = (s.mean(-1, keepdims=True) * 2.0 - 1.0).astype(np.float32)

    # ---- image/clip normalizations (ToTensor chains)
    image_range = np.asarray(image, np.float32) / 255.0 * 2.0 - 1.0
    mean = np.float32([0.48145466, 0.4578275, 0.40821073])
    std = np.float32([0.26862954, 0.26130258, 0.27577711])
    style_clip = (np.asarray(style, np.float32) / 255.0 - mean) / std

    np.savez_compressed(
        HERE / "transforms_256.npz",
        sil=sil, smpl=smpl, image=image, style=style,
        mask_mode=mask_mode.astype(np.float32),
        bbox_mode=bbox_mode.astype(np.float32),
        smpl_mode=smpl_mode,
        image_range=image_range.astype(np.float32),
        style_clip=style_clip.astype(np.float32),
    )
    print("wrote", HERE / "transforms_256.npz")


if __name__ == "__main__":
    main()
