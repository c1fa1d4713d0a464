"""Quality metrics: SSIM, MS-SSIM, LPIPS, FID — the eval_metrics.py suite.

The reference evaluates with pytorch_msssim (SSIM/MS-SSIM), lpips (VGG) and
pytorch_fid (scripts/eval_metrics.py:100-112). None of those packages exist
here, so the math is implemented natively:

- `ssim` / `ms_ssim`: jitted jnp, matching pytorch_msssim defaults
  (gaussian window 11, sigma 1.5, K1=0.01, K2=0.03, data_range configurable;
  MS-SSIM 5 scales with the standard weights, avg-pool 2 between scales).
- `frechet_distance`: classic FID formula |mu1-mu2|^2 + tr(S1+S2-2 sqrt(S1 S2))
  with a scipy sqrtm (host-side; feature extraction is the device part).
- LPIPS: see upgpt_tpu.eval.lpips — VGG16 feature architecture in flax with a
  converter for the standard lpips weights (weights must be supplied;
  zero-egress sandbox has none).

The eval *protocol* (CenterCrop 256x176, paired sample/gt dirs, metrics.csv)
lives in upgpt_tpu.eval.harness.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel1d(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2 * sigma**2))
    return g / jnp.sum(g)


def _gaussian_blur(x: jax.Array, size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Separable valid-mode gaussian filter over NHWC."""
    k = _gaussian_kernel1d(size, sigma)
    c = x.shape[-1]
    kh = jnp.tile(k.reshape(size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return x


@partial(jax.jit, static_argnames=("data_range", "size_average"))
def ssim(
    a: jax.Array, b: jax.Array, data_range: float = 1.0, size_average: bool = True
) -> jax.Array:
    """SSIM over NHWC images (pytorch_msssim-compatible defaults)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    mu_a = _gaussian_blur(a)
    mu_b = _gaussian_blur(b)
    mu_aa = _gaussian_blur(a * a)
    mu_bb = _gaussian_blur(b * b)
    mu_ab = _gaussian_blur(a * b)
    va = mu_aa - mu_a**2
    vb = mu_bb - mu_b**2
    vab = mu_ab - mu_a * mu_b
    cs = (2 * vab + C2) / (va + vb + C2)
    ssim_map = ((2 * mu_a * mu_b + C1) / (mu_a**2 + mu_b**2 + C1)) * cs
    per_image = jnp.mean(ssim_map, axis=(1, 2, 3))
    return jnp.mean(per_image) if size_average else per_image


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _ssim_cs(a, b, data_range):
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    mu_a = _gaussian_blur(a)
    mu_b = _gaussian_blur(b)
    va = _gaussian_blur(a * a) - mu_a**2
    vb = _gaussian_blur(b * b) - mu_b**2
    vab = _gaussian_blur(a * b) - mu_a * mu_b
    cs = jnp.mean((2 * vab + C2) / (va + vb + C2), axis=(1, 2, 3))
    s = jnp.mean(
        ((2 * mu_a * mu_b + C1) / (mu_a**2 + mu_b**2 + C1))
        * ((2 * vab + C2) / (va + vb + C2)),
        axis=(1, 2, 3),
    )
    return s, cs


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


@partial(jax.jit, static_argnames=("data_range", "size_average"))
def ms_ssim(
    a: jax.Array, b: jax.Array, data_range: float = 1.0, size_average: bool = True
) -> jax.Array:
    """Multi-scale SSIM, 5 scales (needs min side >= 176 like pytorch_msssim)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    levels = len(_MSSSIM_WEIGHTS)
    css = []
    s = None
    for i in range(levels):
        s, cs = _ssim_cs(a, b, data_range)
        if i < levels - 1:
            css.append(jnp.maximum(cs, 0.0))
            a = _avg_pool2(a)
            b = _avg_pool2(b)
    vals = jnp.stack(css + [jnp.maximum(s, 0.0)])  # (levels, B)
    w = jnp.asarray(_MSSSIM_WEIGHTS, jnp.float32)[:, None]
    out = jnp.prod(vals**w, axis=0)
    return jnp.mean(out) if size_average else out


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """FID between two gaussians (pytorch_fid's calculation, host-side)."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_features(feats1: np.ndarray, feats2: np.ndarray) -> float:
    """FID given two (N, D) activation sets (InceptionV3 pool3 classically;
    any consistent embedding works for relative comparisons)."""
    mu1, s1 = feats1.mean(0), np.cov(feats1, rowvar=False)
    mu2, s2 = feats2.mean(0), np.cov(feats2, rowvar=False)
    return frechet_distance(mu1, s1, mu2, s2)
