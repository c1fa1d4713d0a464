"""InceptionV3 pool3 feature extractor — the FID protocol network.

The reference computes FID with `python -m pytorch_fid`
(/root/reference/scripts/eval_metrics.py:100-112), whose network is the
TF-ported "pt_inception-2015-12-05" InceptionV3: torchvision's inception_v3
graph with three FID-specific patches (pytorch_fid/inception.py):

  - InceptionA/C/E pool branches use avg_pool(count_include_pad=False)
  - the second InceptionE block (Mixed_7c) uses MAX pooling in its pool
    branch instead of average pooling
  - the classifier head has 1008 outputs (unused here; FID reads the 2048-d
    global-average "pool3" activations)

This module is a TPU-native (NHWC, inference-only, BatchNorm folded into
per-channel affines) re-implementation of that graph plus a converter from
the pt_inception state_dict, so that once the standard weight file is
available the harness computes protocol-exact FID. Preprocessing matches
pytorch_fid exactly: input in [0,1], bilinear resize to 299x299
(align_corners=False ≡ jax.image.resize "bilinear"), then scaled to [-1,1].
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

FID_FEATURE_DIM = 2048
FID_NUM_CLASSES = 1008  # TF-ported weights; unused by pool3 features


def _avg_pool_3x3_nopad_count(x: jax.Array) -> jax.Array:
    """3x3 stride-1 avg pool, pad 1, count_include_pad=False (torch F.avg_pool2d
    with count_include_pad=False): border windows divide by the number of
    REAL elements, not 9."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    sums = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return sums / counts


def _max_pool(x: jax.Array, window: int, stride: int, pad: int = 0) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


class BasicConv2d(nn.Module):
    """Conv(no bias) + folded BatchNorm(eps 1e-3) + ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.features,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        return jax.nn.relu(x * scale + bias)


def _c(features, k, s=1, p=0):
    kk = (k, k) if isinstance(k, int) else k
    pp = ((p, p), (p, p)) if isinstance(p, int) else ((p[0], p[0]), (p[1], p[1]))
    return dict(features=features, kernel=kk, strides=(s, s), padding=pp)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(**_c(64, 1), name="branch1x1")(x)
        b5 = BasicConv2d(**_c(48, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(**_c(64, 5, p=2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(**_c(64, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(**_c(96, 3, p=1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(**_c(96, 3, p=1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_nopad_count(x)
        bp = BasicConv2d(**_c(self.pool_features, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(**_c(384, 3, s=2), name="branch3x3")(x)
        bd = BasicConv2d(**_c(64, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(**_c(96, 3, p=1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(**_c(96, 3, s=2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(**_c(192, 1), name="branch1x1")(x)
        b7 = BasicConv2d(**_c(c7, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(**_c(c7, (1, 7), p=(0, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(**_c(192, (7, 1), p=(3, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(**_c(c7, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(**_c(c7, (7, 1), p=(3, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(**_c(c7, (1, 7), p=(0, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(**_c(c7, (7, 1), p=(3, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(**_c(192, (1, 7), p=(0, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_nopad_count(x)
        bp = BasicConv2d(**_c(192, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(**_c(192, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(**_c(320, 3, s=2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(**_c(192, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(**_c(192, (1, 7), p=(0, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(**_c(192, (7, 1), p=(3, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(**_c(192, 3, s=2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    # Mixed_7b uses avg (count_include_pad=False), Mixed_7c uses MAX pooling
    # (the pytorch_fid FIDInceptionE_2 patch)
    pool_mode: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(**_c(320, 1), name="branch1x1")(x)
        b3 = BasicConv2d(**_c(384, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(**_c(384, (1, 3), p=(0, 1)), name="branch3x3_2a")(b3),
            BasicConv2d(**_c(384, (3, 1), p=(1, 0)), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(**_c(448, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(**_c(384, 3, p=1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(**_c(384, (1, 3), p=(0, 1)), name="branch3x3dbl_3a")(bd),
            BasicConv2d(**_c(384, (3, 1), p=(1, 0)), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "max":
            bp = _max_pool(x, 3, 1, pad=1)
        else:
            bp = _avg_pool_3x3_nopad_count(x)
        bp = BasicConv2d(**_c(192, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """pool3 (2048-d) feature trunk of the FID InceptionV3. Input: NHWC
    299x299 in [-1, 1] (use `preprocess_fid` to get there from [0,1])."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(**_c(32, 3, s=2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(**_c(32, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(**_c(64, 3, p=1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(**_c(80, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(**_c(192, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (N, 2048)


def preprocess_fid(images: jax.Array) -> jax.Array:
    """pytorch_fid's exact input transform: [0,1] float NHWC of any size ->
    bilinear 299x299 (align_corners=False) -> [-1,1]. No crop."""
    n = images.shape[0]
    c = images.shape[-1]
    # antialias=False: pytorch_fid uses F.interpolate(..., align_corners=False)
    # which never antialiases; jax.image.resize defaults to antialias=True on
    # downscale, which would change pool3 features for >299px inputs
    x = jax.image.resize(images, (n, 299, 299, c), method="bilinear",
                         antialias=False)
    return x * 2.0 - 1.0


# ---------------- torch state_dict converter ----------------


def _fold_bn(sd: Dict[str, np.ndarray], prefix: str, eps: float = 1e-3):
    gamma = np.asarray(sd[f"{prefix}.bn.weight"], np.float32)
    beta = np.asarray(sd[f"{prefix}.bn.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.bn.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.bn.running_var"], np.float32)
    scale = gamma / np.sqrt(var + eps)
    return scale, beta - mean * scale


def _conv_kernel(sd: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    # torch OIHW -> flax HWIO
    w = np.asarray(sd[f"{prefix}.conv.weight"], np.float32)
    return w.transpose(2, 3, 1, 0)


def convert_inception_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """pt_inception (pytorch_fid) state_dict -> InceptionV3Features params.

    Accepts the standard FID weight file's layout (torchvision names; the
    1008-way `fc` head is ignored). BatchNorm running stats are folded into
    per-channel (scale, bias)."""
    model = InceptionV3Features()
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    )["params"]

    def build(tree, path):
        out = {}
        for name, sub in tree.items():
            p = f"{path}.{name}" if path else name
            if "conv" in sub and "bn_scale" in sub:  # a BasicConv2d
                scale, bias = _fold_bn(sd, p)
                out[name] = {
                    "conv": {"kernel": _conv_kernel(sd, p)},
                    "bn_scale": scale,
                    "bn_bias": bias,
                }
            else:
                out[name] = build(sub, p)
        return out

    params = build(shapes, "")
    got = jax.tree.map(lambda a: tuple(np.shape(a)), params)
    want = jax.tree.map(lambda a: tuple(a.shape), shapes)
    assert got == want, "converted Inception params shape mismatch"
    return params


def load_pt_inception(path: str) -> Dict:
    """Load + convert the pt_inception-2015-12-05 .pth file (torch pickle)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_inception_state_dict(sd)


@dataclasses.dataclass
class InceptionFeatureFn:
    """`(N,H,W,C) in [-1,1] -> (N,2048)` callable for harness.evaluate_dirs
    (its images arrive as x*2-1 of [0,1] pixels — exactly pytorch_fid's
    normalize_input step, so only the resize is applied here)."""

    params: Dict
    # picked up by evaluate_dirs: the metric lands as `fid_inception`,
    # distinguishing the protocol FID from any CLIP-pooled fallback
    fid_name = "inception"

    def __post_init__(self):
        model = InceptionV3Features()
        self._fn = jax.jit(
            lambda p, x: model.apply({"params": p}, _resize299(x))
        )

    def __call__(self, images_pm1: jax.Array) -> jax.Array:
        return self._fn(self.params, images_pm1)


def _resize299(x: jax.Array) -> jax.Array:
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, 299, 299, c), method="bilinear",
                            antialias=False)
