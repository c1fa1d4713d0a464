"""Offline dataset preparation: segmentation conversion, style extraction,
high-res resize.

Covers the reference prep scripts (SURVEY.md §2.3 'Data prep scripts'):
- `convert_segm_image`: RGB-palette segmentation PNG -> label-id map using
  the DeepFashion-MM color table (utils/segment.py:20-55 semantics).
- `extract_styles`: per-part style crops from (image, segm) pairs into
  styles/<id>/<slot>.jpg (scripts/segment.py behavior, via
  upgpt_tpu.data.segm.DeepfashionMMStyleSegmenter).
- `resize_highres`: edge-pad (38, 0) + LANCZOS resize of the 750x1101
  originals to 512x384 / 256x192 (scripts/resize_highres.py behavior).

All pure numpy/PIL with a multiprocessing Pool; run once per dataset.
"""

from __future__ import annotations

import os
from multiprocessing import Pool
from pathlib import Path
from typing import Dict, Iterable, Optional, Tuple

import numpy as np
from PIL import Image

# DeepFashion-MM palette -> label ids (same mapping the reference's
# conversion table encodes; utils/segment.py:20-37)
SEGM_COLOR_TABLE: Dict[Tuple[int, int, int], int] = {
    (0, 0, 0): 0,        # background
    (255, 250, 250): 1,  # top
    (250, 235, 215): 3,  # skirt
    (70, 130, 180): 6,   # leggings
    (16, 78, 139): 14,   # face
    (255, 250, 205): 4,  # dress
    (255, 140, 0): 12,   # bag
    (50, 205, 50): 9,    # neckwear
    (220, 220, 220): 2,  # outer
    (255, 0, 0): 13,     # hair
    (127, 255, 212): 7,  # headwear
    (0, 100, 0): 8,      # eyeglass
    (255, 255, 0): 10,   # belt
    (211, 211, 211): 5,  # pants
    (144, 238, 144): 15, # skin
    (245, 222, 179): 11, # footwear
}


def palette() -> list:
    label2color = {v: k for k, v in SEGM_COLOR_TABLE.items()}
    out = []
    for i in range(len(label2color)):
        out.extend(label2color[i])
    return out


def convert_segm_image(segm_rgb: np.ndarray) -> Image.Image:
    """RGB segmentation -> paletted label-id image."""
    segm_rgb = segm_rgb[..., :3]
    h, w = segm_rgb.shape[:2]
    labels = np.zeros((h, w), np.uint8)
    for color, label in SEGM_COLOR_TABLE.items():
        labels[np.all(segm_rgb == color, axis=2)] = label
    img = Image.fromarray(labels).convert("P")
    img.putpalette(palette())
    return img


def convert_segm_file(args: Tuple[str, str]) -> None:
    src, dst = args
    rgb = np.asarray(Image.open(src).convert("RGB"))
    out = convert_segm_image(rgb)
    Path(dst).parent.mkdir(parents=True, exist_ok=True)
    out.save(dst)


def extract_styles_for(args: Tuple[str, str, str]) -> None:
    """(image_path, segm_path, out_dir) -> per-slot style jpgs."""
    from upgpt_tpu.data.segm import DeepfashionMMStyleSegmenter

    image_path, segm_path, out_dir = args
    seg = DeepfashionMMStyleSegmenter()
    img = np.asarray(Image.open(image_path).convert("RGB"), np.float32) / 255.0
    segm = np.asarray(Image.open(segm_path))
    crops = seg(img, segm)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for name, crop in crops.items():
        if crop.sum() == 0:
            continue  # absent slot -> no file (zero-slot at load time)
        Image.fromarray((np.clip(crop, 0, 1) * 255).astype(np.uint8)).save(
            out / f"{name}.jpg"
        )


def resize_highres_file(args: Tuple[str, str, int]) -> None:
    """750x1101 original -> edge-pad (38,0) + LANCZOS to size x size*3/4."""
    src, dst, size = args
    img = Image.open(src).convert("RGB")
    arr = np.asarray(img)
    arr = np.pad(arr, ((0, 0), (38, 38), (0, 0)), mode="edge")
    img = Image.fromarray(arr).resize((size * 3 // 4, size), Image.LANCZOS)
    Path(dst).parent.mkdir(parents=True, exist_ok=True)
    img.save(dst, quality=95)


def run_parallel(fn, jobs: Iterable, workers: Optional[int] = None) -> None:
    jobs = list(jobs)
    with Pool(workers or os.cpu_count()) as pool:
        pool.map(fn, jobs)
