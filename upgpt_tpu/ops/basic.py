"""Core NN ops, NHWC, with the reference's exact numerics.

Semantics matched against the reference (file:line cites into /root/reference):
- `group_norm`: GroupNorm(32) computed in fp32 regardless of input dtype, cast
  back to the input dtype afterwards (GroupNorm32, diffusionmodules/util.py:214-216).
  U-Net uses eps=1e-5 (torch default via `normalization`, util.py:199-205);
  VAE / SpatialTransformer use eps=1e-6 (attention.py:76-77, model.py:38-39).
- `timestep_embedding`: cos-first sinusoid used by the U-Net
  (diffusionmodules/util.py:151-171). The DDPM/VAE variant is sin-first with a
  different frequency spacing (model.py:12-30) — both are provided.
- `silu`: x * sigmoid(x) (util.py:209-211).

All ops are plain jnp so XLA fuses them into surrounding convs; the Pallas
fused GroupNorm+SiLU kernel in upgpt_tpu/ops/fused_gn.py plugs in behind
`group_norm(..., fused=True)` on TPU.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm over the trailing channel dim of an NHWC (or N...C) tensor.

    Computes statistics in float32 and casts the result back to ``x.dtype``
    (GroupNorm32 semantics, reference util.py:214-216). ``scale``/``bias`` are
    per-channel (C,) parameters.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    n = xf.shape[0]
    c = xf.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    cpg = c // num_groups
    x2d = xf.reshape(n, -1, c)
    s = x2d.shape[1]
    # Group statistics via two tiny MXU matmuls against a one-hot (C, G)
    # membership matrix. The naive (N, S, G, C/G) reduction puts C/G (7/14/28
    # for the UPGPT widths) in the lane dim — a strided, lane-misaligned
    # reduce that cost ~5.6 ms/step in round-1 traces; the matmul form keeps
    # every op lane-aligned and rides the MXU.
    m = jnp.equal(
        jnp.arange(c)[:, None] // cpg, jnp.arange(num_groups)[None, :]
    ).astype(jnp.float32)
    cnt = float(s * cpg)
    s1 = jnp.einsum("nsc,cg->ng", x2d, m, preferred_element_type=jnp.float32)
    s2 = jnp.einsum(
        "nsc,cg->ng", jnp.square(x2d), m, preferred_element_type=jnp.float32
    )
    mean_g = s1 / cnt
    var_g = jnp.maximum(s2 / cnt - jnp.square(mean_g), 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast per-group stats back to channels (G -> C, tiny matmuls)
    mean_c = mean_g @ m.T
    inv_c = inv_g @ m.T
    a = inv_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean_c * a
    y = x2d * a[:, None, :] + b[:, None, :]
    return y.reshape(x.shape).astype(orig_dtype)


def timestep_embedding(
    timesteps: jax.Array, dim: int, max_period: float = 10000.0
) -> jax.Array:
    """Sinusoidal timestep embedding, cos-first (U-Net convention).

    Matches reference diffusionmodules/util.py:151-171: freqs are
    exp(-log(max_period) * arange(half)/half), embedding is
    [cos(t*f), sin(t*f)] with odd-dim zero pad. fp32 throughout.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def timestep_embedding_ddpm(timesteps: jax.Array, dim: int) -> jax.Array:
    """Sin-first fairseq-style embedding (VAE `Model` convention).

    Matches reference diffusionmodules/model.py:12-30: denominator is
    (half-1), order is [sin, cos]. Unused by the released UPGPT weights but
    part of the component surface.
    """
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    out = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """2x nearest-neighbour upsample of an NHWC tensor.

    Equivalent to F.interpolate(scale_factor=2, mode="nearest")
    (reference openaimodel.py:109-119, model.py:42-57), done with reshapes and
    broadcasts so XLA lowers it to cheap copies rather than a gather.
    """
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def asymmetric_pad_hw(x: jax.Array) -> jax.Array:
    """Pad NHWC with (top=0, bottom=1, left=0, right=1) zeros.

    The VAE downsample path uses torch pad (0,1,0,1) before a stride-2
    VALID conv (reference model.py:60-79).
    """
    return jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))


@partial(jax.jit, static_argnames=("out_dtype",))
def normalize_to_clip(x: jax.Array, out_dtype=jnp.float32) -> jax.Array:
    """Map [-1, 1] images to CLIP's expected normalized pixel space.

    Matches FrozenClipImageEmbedder.preprocess (reference
    encoders/modules.py:218-230): (x+1)/2 then per-channel CLIP mean/std.
    Input/output NHWC.
    """
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073], dtype=jnp.float32)
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711], dtype=jnp.float32)
    x = (x.astype(jnp.float32) + 1.0) / 2.0
    return ((x - mean) / std).astype(out_dtype)
