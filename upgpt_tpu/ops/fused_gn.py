"""Pallas fused GroupNorm(+SiLU) kernel.

The U-Net/VAE resblock pattern is GN32 -> SiLU -> conv
(openaimodel.py:201-232, model.py:82-141). Under XLA the GN statistics force
two passes over the activation in HBM (reduce, then normalize) plus layout
churn from the (N,*,G,C/G) reshape. This kernel does everything in one VMEM
pass per image:

  - grid over N; block = the whole (HW, C) activation of one image in VMEM
    (latent-res tensors are 0.3-5 MB — far under the ~16 MB VMEM budget)
  - channel sums/squares via VPU reductions, group aggregation via two tiny
    MXU matmuls with a one-hot (C, G) matrix — no lane-crossing reshapes
  - fp32 statistics (GroupNorm32 semantics, util.py:214-216), optional fused
    SiLU, output written once.

Falls back to the jnp path automatically for shapes that exceed the VMEM
budget (the 256px-image VAE tensors) or on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _group_matrix(c: int, g: int) -> np.ndarray:
    m = np.zeros((c, g), np.float32)
    m[np.arange(c), np.arange(c) // (c // g)] = 1.0
    return m


def _gn_kernel(x_ref, m_ref, scale_ref, bias_ref, o_ref, *,
               eps: float, hw: int, cpg: int, with_silu: bool):
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    m = m_ref[...]  # (C, G)
    cnt = float(hw * cpg)
    s1 = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    g1 = jnp.dot(s1, m, preferred_element_type=jnp.float32) / cnt  # (1, G)
    g2 = jnp.dot(s2, m, preferred_element_type=jnp.float32) / cnt
    var = g2 - g1 * g1
    inv_g = jax.lax.rsqrt(var + eps)
    mean_c = jnp.dot(g1, m.T, preferred_element_type=jnp.float32)  # (1, C)
    inv_c = jnp.dot(inv_g, m.T, preferred_element_type=jnp.float32)
    out = (x - mean_c) * inv_c * scale_ref[...] + bias_ref[...]
    if with_silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def fused_group_norm_qualifies(shape, num_groups: int) -> bool:
    if len(shape) != 4:
        return False
    n, h, w, c = shape
    if c % num_groups != 0:
        return False
    # one image's activation (fp32 working set ~3x block) must fit VMEM
    return h * w * c * 4 * 3 <= _VMEM_BUDGET_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    with_silu: bool = False,
) -> jax.Array:
    """GroupNorm(+SiLU) over NHWC via the Pallas kernel.

    Differentiable: Pallas forward, backward via the jnp formulation
    (identical math; a fused Pallas backward is future work)."""
    return _fused_gn_forward(x, scale, bias, num_groups, eps, with_silu)


def _reference_gn(x, scale, bias, num_groups, eps, with_silu):
    from upgpt_tpu.ops.basic import group_norm, silu

    out = group_norm(x, scale, bias, num_groups=num_groups, eps=eps)
    return silu(out) if with_silu else out


def _fused_gn_fwd(x, scale, bias, num_groups, eps, with_silu):
    return _fused_gn_forward(x, scale, bias, num_groups, eps, with_silu), (
        x, scale, bias,
    )


def _fused_gn_bwd(num_groups, eps, with_silu, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _reference_gn(x_, s_, b_, num_groups, eps, with_silu),
        x, scale, bias,
    )
    return vjp(g)


def _fused_gn_forward(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    with_silu: bool = False,
) -> jax.Array:
    n, h, w, c = x.shape
    hw = h * w
    m = jnp.asarray(_group_matrix(c, num_groups))
    xr = x.reshape(n, hw, c)
    kernel = functools.partial(
        _gn_kernel, eps=eps, hw=hw, cpg=c // num_groups, with_silu=with_silu
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * hw * c,
            bytes_accessed=2 * n * hw * c * x.dtype.itemsize,
            transcendentals=n * hw * c if with_silu else 0,
        ),
    )(xr, m, scale.reshape(1, c).astype(jnp.float32),
      bias.reshape(1, c).astype(jnp.float32))
    return out.reshape(n, h, w, c)


fused_group_norm.defvjp(_fused_gn_fwd, _fused_gn_bwd)
