"""Evaluation harness: the scripts/eval_metrics.py protocol.

Protocol parity (reference scripts/eval_metrics.py:90-136 + test_step
ddpm.py:1327-1377): paired `samples/` and `gt/` directories of same-named
images, center-cropped to 256x176, per-image SSIM + MS-SSIM (+ LPIPS when
weights are supplied), FID over the two sets, written to metrics.csv and
metrics.txt.

FID features come from a pluggable extractor (InceptionV3 pool3 in the
reference via pytorch_fid; here any `(N,H,W,C)->(N,D)` callable — the
framework ships a CLIP-vision pooled extractor which is a widely used FID
variant, and accepts converted Inception weights when available). Relative
comparisons require only a CONSISTENT extractor.
"""

from __future__ import annotations

import csv
import os
from pathlib import Path
from typing import Callable, Dict, List, Optional

import numpy as np
from PIL import Image

from upgpt_tpu.eval.metrics import fid_from_features, ms_ssim, ssim


def _load_pairs(sample_dir: str, gt_dir: str) -> List[str]:
    names = sorted(os.listdir(sample_dir))
    return [n for n in names if (Path(gt_dir) / n).exists()]


def _center_crop_np(arr: np.ndarray, hw=(256, 176)) -> np.ndarray:
    h, w = arr.shape[:2]
    th, tw = hw
    top = (h - th) // 2
    left = (w - tw) // 2
    return arr[top : top + th, left : left + tw]


def evaluate_dirs(
    results_dir: str,
    crop_hw=(256, 176),
    batch_size: int = 16,
    lpips_fn: Optional[Callable] = None,
    fid_feature_fn: Optional[Callable] = None,
    fid_name: Optional[str] = None,
) -> Dict[str, float]:
    """Evaluate `results_dir/samples` against `results_dir/gt`.

    Returns the metric dict and writes metrics.csv (per-image) and
    metrics.txt (means) next to the inputs, like eval_metrics.py:113-136.
    """
    import jax.numpy as jnp

    sample_dir = str(Path(results_dir) / "samples")
    gt_dir = str(Path(results_dir) / "gt")
    names = _load_pairs(sample_dir, gt_dir)
    if not names:
        raise FileNotFoundError(f"no paired images under {results_dir}")

    rows = []
    feats_s, feats_g = [], []
    for i in range(0, len(names), batch_size):
        chunk = names[i : i + batch_size]
        s = np.stack([
            _center_crop_np(np.asarray(Image.open(Path(sample_dir) / n).convert("RGB"),
                                       np.float32) / 255.0, crop_hw)
            for n in chunk
        ])
        g = np.stack([
            _center_crop_np(np.asarray(Image.open(Path(gt_dir) / n).convert("RGB"),
                                       np.float32) / 255.0, crop_hw)
            for n in chunk
        ])
        s_j, g_j = jnp.asarray(s), jnp.asarray(g)
        ssim_v = np.asarray(ssim(s_j, g_j, size_average=False))
        msssim_v = np.asarray(ms_ssim(s_j, g_j, size_average=False))
        lpips_v = (
            np.asarray(lpips_fn(s_j * 2 - 1, g_j * 2 - 1))
            if lpips_fn is not None else None
        )
        for j, (n, sv, mv) in enumerate(zip(chunk, ssim_v, msssim_v)):
            row = {"file": n, "ssim": float(sv), "ms_ssim": float(mv)}
            if lpips_v is not None:
                row["lpips"] = float(lpips_v[j])
            rows.append(row)
        if fid_feature_fn is not None:
            feats_s.append(np.asarray(fid_feature_fn(s_j * 2 - 1)))
            feats_g.append(np.asarray(fid_feature_fn(g_j * 2 - 1)))

    metrics = {
        "ssim": float(np.mean([r["ssim"] for r in rows])),
        "ms_ssim": float(np.mean([r["ms_ssim"] for r in rows])),
        "n_images": len(rows),
    }
    if lpips_fn is not None:
        metrics["lpips"] = float(np.mean([r["lpips"] for r in rows]))
    if fid_feature_fn is not None:
        # the metric key names its extractor (fid_inception = protocol FID
        # via the pytorch_fid InceptionV3 pool3 port; fid_clip = the
        # CLIP-pooled variant) so a CLIP-FID can never masquerade as the
        # reference protocol's number in metrics.csv/txt
        name = fid_name or getattr(fid_feature_fn, "fid_name", None)
        key = f"fid_{name}" if name else "fid"
        metrics[key] = fid_from_features(
            np.concatenate(feats_s), np.concatenate(feats_g)
        )
        if key == "fid_inception":
            # compat alias: external consumers of metrics.csv/txt keyed on
            # the pre-rename 'fid' still see the protocol (inception) number
            metrics["fid"] = metrics[key]

    fields = ["file", "ssim", "ms_ssim"] + (["lpips"] if lpips_fn else [])
    with open(Path(results_dir) / "metrics.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    with open(Path(results_dir) / "metrics.txt", "w") as f:
        for k, v in metrics.items():
            f.write(f"{k}: {v}\n")
    return metrics


def dump_test_results(
    results_dir: str,
    fnames: List[str],
    samples: np.ndarray,
    gt: Optional[np.ndarray] = None,
    extra: Optional[Dict[str, np.ndarray]] = None,
    styles: Optional[np.ndarray] = None,
    make_concats: bool = False,
    crop_hw=(256, 176),
) -> None:
    """test_step-style result dump (ddpm.py:1327-1377): center-cropped,
    denormalized jpgs into results/{samples,gt,recon,src,smpl}/<fname>.jpg,
    plus `concats/` (src|sample|recon|smpl side by side, ddpm.py:1362-1363)
    and `styles/` (CLIP-denormalized 9-slot strips, uncropped,
    ddpm.py:1371-1377)."""
    root = Path(results_dir)
    groups = {"samples": samples}
    if gt is not None:
        groups["gt"] = gt
    if extra:
        groups.update(extra)
    cropped: Dict[str, np.ndarray] = {}
    for group, imgs in groups.items():
        d = root / group
        d.mkdir(parents=True, exist_ok=True)
        arrs = []
        for name, img in zip(fnames, imgs):
            arr = _center_crop_np(np.asarray(img, np.float32), crop_hw)
            arr = np.clip((arr + 1.0) / 2.0, 0, 1)
            arrs.append(arr)
            Image.fromarray((arr * 255).astype(np.uint8)).save(d / f"{name}.jpg")
        cropped[group] = arrs
    if make_concats and all(k in cropped for k in ("samples", "recon", "src", "smpl")):
        d = root / "concats"
        d.mkdir(parents=True, exist_ok=True)
        for i, name in enumerate(fnames):
            ref_hw = cropped["samples"][i].shape[:2]

            def _match(a, hw=ref_hw):
                if a.shape[:2] == hw:
                    return a
                im = Image.fromarray((a * 255).astype(np.uint8))
                return np.asarray(im.resize(hw[::-1]), np.float32) / 255.0

            cat = np.concatenate(
                [_match(cropped["src"][i]), cropped["samples"][i],
                 _match(cropped["recon"][i]), _match(cropped["smpl"][i])],
                axis=1,
            )
            Image.fromarray((cat * 255).astype(np.uint8)).save(d / f"{name}.jpg")
    if styles is not None:
        # reference denorm uses the 0.226862954 std typo for R
        # (ddpm.py:1330); preserved for byte-level output parity
        std = np.asarray([0.226862954, 0.26130258, 0.27577711], np.float32)
        mean = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
        d = root / "styles"
        d.mkdir(parents=True, exist_ok=True)
        for name, slots in zip(fnames, np.asarray(styles, np.float32)):
            strip = np.concatenate(list(slots), axis=1)  # (224, 9*224, 3)
            strip = np.clip(strip * std + mean, 0, 1)
            Image.fromarray((strip * 255).astype(np.uint8)).save(d / f"{name}.jpg")
