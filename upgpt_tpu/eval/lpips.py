"""LPIPS (VGG16 variant) in flax — the perceptual metric of eval_metrics.py
and of the VAE training loss (contperceptual.py:7-110 via taming LPIPS).

Architecture: images in [-1,1] -> fixed input scaling (the published LPIPS
shift/scale constants) -> VGG16 conv stack -> features at relu1_2, relu2_2,
relu3_3, relu4_3, relu5_3 -> per-channel unit-normalize -> squared diff ->
learned 1x1 'lin' heads -> spatial mean -> sum over the 5 layers.

Weights (torchvision VGG16 + lpips lin heads) must be converted with
`convert_lpips_weights` from user-supplied checkpoints — this sandbox cannot
download them. All math is jnp and jit-friendly (NHWC).
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# published LPIPS input scaling constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv plan: (out_channels, pool_before)
_VGG16_PLAN = [
    (64, False), (64, False),          # relu1_1, relu1_2   <- tap 0
    (128, True), (128, False),         # relu2_1, relu2_2   <- tap 1
    (256, True), (256, False), (256, False),   # relu3_*    <- tap 2
    (512, True), (512, False), (512, False),   # relu4_*    <- tap 3
    (512, True), (512, False), (512, False),   # relu5_*    <- tap 4
]
_TAPS = (1, 3, 6, 9, 12)
LPIPS_CHANNELS = (64, 128, 256, 512, 512)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        feats = []
        for i, (ch, pool) in enumerate(_VGG16_PLAN):
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(ch, (3, 3), padding=1, name=f"conv_{i}")(x)
            x = nn.relu(x)
            if i in _TAPS:
                feats.append(x)
        return feats


class LPIPS(nn.Module):
    """lpips(a, b) over NHWC images in [-1, 1]; returns (B,) distances."""

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        def scale(x):
            return (x.astype(jnp.float32) - _SHIFT) / _SCALE

        vgg = VGG16Features(name="vgg")
        fa = vgg(scale(a))
        fb = vgg(scale(b))
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa * jax.lax.rsqrt(jnp.sum(xa**2, -1, keepdims=True) + 1e-10)
            nb = xb * jax.lax.rsqrt(jnp.sum(xb**2, -1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin_{i}")(diff)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def load_lpips_fn(path: str):
    """Weights file (torch `lpips.LPIPS(net='vgg')` state_dict, or an .npz
    of the same keys) -> jitted `(a, b) -> (B,)` LPIPS callable for
    `evaluate_dirs(lpips_fn=...)` / the weight-drop runbook."""
    if str(path).endswith(".npz"):
        sd = dict(np.load(path))
    else:
        import torch

        sd = torch.load(path, map_location="cpu")
        sd = sd.get("state_dict", sd)
    params = convert_lpips_weights(sd)
    mod = LPIPS()
    return jax.jit(lambda a, b: mod.apply({"params": params}, a, b))


def rehearsal_lpips_fn(seed: int = 0):
    """Fixed-random-extractor LPIPS rehearsal (VERDICT r4 item 8).

    The published metric needs torchvision VGG16 + lin-head weights this
    sandbox cannot download; this returns the SAME jitted code path with
    deterministically seeded random weights (abs() on the lin heads keeps
    the distance nonnegative like the published ReLU'd heads). A random
    deep feature distance is still a meaningful perceptual-change detector
    (random-VGG LPIPS correlates with the trained metric's ordering far
    better than pixel MSE), but the absolute numbers are NOT the published
    LPIPS — label such columns 'lpips_rehearsal'. Swapping in real weights
    via load_lpips_fn changes nothing else in the pipeline.
    """
    mod = LPIPS()
    params = mod.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))["params"]
    # abs only the lin heads (nonnegativity); the VGG convs keep their
    # signed init so the features stay diverse
    params = {k: (jax.tree.map(jnp.abs, v) if k.startswith("lin_") else v)
              for k, v in dict(params).items()}
    return jax.jit(lambda a, b: mod.apply({"params": params}, a, b))


def convert_lpips_weights(lpips_state_dict: Mapping[str, "np.ndarray"]) -> Dict:
    """lpips-package state_dict (net.slice*/lin*) -> LPIPS flax params.

    Accepts the standard `lpips.LPIPS(net='vgg')` torch state_dict layout:
    `net.sliceK.<idx>.weight/bias` (VGG convs) and `linK.model.1.weight`.
    """
    def _np(t):
        return t if isinstance(t, np.ndarray) else t.detach().cpu().numpy()

    params: Dict = {"vgg": {}, }
    # map torchvision feature indices -> our conv_{i}
    # slices: slice1 idx 0,2 ; slice2 idx 5,7 ; slice3 idx 10,12,14 ;
    # slice4 idx 17,19,21 ; slice5 idx 24,26,28
    slice_plan = [
        ("net.slice1", [0, 2]),
        ("net.slice2", [5, 7]),
        ("net.slice3", [10, 12, 14]),
        ("net.slice4", [17, 19, 21]),
        ("net.slice5", [24, 26, 28]),
    ]
    conv_i = 0
    for prefix, idxs in slice_plan:
        for idx in idxs:
            w = _np(lpips_state_dict[f"{prefix}.{idx}.weight"])
            b = _np(lpips_state_dict[f"{prefix}.{idx}.bias"])
            params["vgg"][f"conv_{conv_i}"] = {
                "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
                "bias": b,
            }
            conv_i += 1
    for k in range(5):
        w = _np(lpips_state_dict[f"lin{k}.model.1.weight"])
        params[f"lin_{k}"] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        }
    return params
