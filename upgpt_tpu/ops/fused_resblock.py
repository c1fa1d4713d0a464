"""Pallas fused GroupNorm + SiLU + 3x3 conv — the resblock half-step.

The U-Net resblock runs GN32 -> SiLU -> conv3x3 twice per block
(openaimodel.py:201-232). Under XLA that is (per half-step): a reduce pass
for GN stats, a normalize+SiLU pass, and a conv — three HBM round-trips over
the activation. This kernel performs the whole half-step in one VMEM
residency per image:

  - grid over N; x (H, W, C) lives in VMEM
  - GN statistics exactly like ops/fused_gn.py (VPU reductions + one-hot
    group matmuls, fp32)
  - normalized+SiLU activation written to a zero-padded (H+2, W+2, C)
    scratch (SAME-1 padding)
  - the 3x3 conv as 9 accumulated (H*W, C) @ (C, O) MXU matmuls over the
    shifted windows (classic shift-and-matmul lowering), fp32 accumulator

Shapes are the latent-res U-Net tensors (48-768 spatial positions, 224-896
channels) — M, K, N all MXU-friendly. The VAE's 256px tensors exceed the
VMEM budget and fall back to XLA (see `fused_resblock_qualifies`).

Differentiable via custom VJP with an XLA-recompute backward, like the other
kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from upgpt_tpu.ops.fused_gn import _group_matrix

_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def fused_resblock_qualifies(shape, out_channels: int, num_groups: int = 32) -> bool:
    if len(shape) != 4:
        return False
    n, h, w, c = shape
    if c % num_groups != 0:
        return False
    # fp32 working set: x + padded scratch + out accumulator + bf16 weights
    need = (h * w * c + (h + 2) * (w + 2) * c + h * w * out_channels) * 4 \
        + 9 * c * out_channels * 2
    return need <= _VMEM_BUDGET_BYTES


def _kernel(x_ref, m_ref, gs_ref, gb_ref, k_ref, kb_ref, o_ref, pad_ref,
            *, eps: float, h: int, w: int, cpg: int):
    c = x_ref.shape[-1]
    o = o_ref.shape[-1]
    x = x_ref[0].astype(jnp.float32)  # (H, W, C)
    m = m_ref[...]

    # --- GroupNorm stats (fp32) ---
    xr = x.reshape(h * w, c)
    cnt = float(h * w * cpg)
    s1 = jnp.sum(xr, axis=0, keepdims=True)
    s2 = jnp.sum(xr * xr, axis=0, keepdims=True)
    g1 = jnp.dot(s1, m, preferred_element_type=jnp.float32) / cnt
    g2 = jnp.dot(s2, m, preferred_element_type=jnp.float32) / cnt
    inv_g = jax.lax.rsqrt(g2 - g1 * g1 + eps)
    mean_c = jnp.dot(g1, m.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, m.T, preferred_element_type=jnp.float32)

    y = (xr - mean_c) * inv_c * gs_ref[...] + gb_ref[...]
    y = y * jax.nn.sigmoid(y)  # SiLU

    # --- zero-padded activation for SAME-1 conv ---
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[1:h + 1, 1:w + 1, :] = y.reshape(h, w, c).astype(pad_ref.dtype)

    # --- 3x3 conv as 9 shifted matmuls, fp32 accumulate ---
    acc = jnp.broadcast_to(kb_ref[...], (h * w, o)).astype(jnp.float32)
    for di in range(3):
        for dj in range(3):
            patch = pad_ref[di:di + h, dj:dj + w, :].reshape(h * w, c)
            acc = acc + jnp.dot(
                patch, k_ref[di * 3 + dj],
                preferred_element_type=jnp.float32,
            )
    o_ref[0] = acc.reshape(h, w, o).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_gn_silu_conv(
    x: jax.Array,
    gn_scale: jax.Array,
    gn_bias: jax.Array,
    conv_kernel: jax.Array,  # (3, 3, C, O) HWIO
    conv_bias: jax.Array,    # (O,)
    num_groups: int = 32,
    eps: float = 1e-5,
) -> jax.Array:
    """GN32(fp32 stats) -> SiLU -> SAME-1 3x3 conv over NHWC, one kernel."""
    return _fused_forward(x, gn_scale, gn_bias, conv_kernel, conv_bias,
                          num_groups, eps)


def _reference(x, gn_scale, gn_bias, conv_kernel, conv_bias, num_groups, eps):
    from upgpt_tpu.ops.basic import group_norm, silu

    y = silu(group_norm(x, gn_scale, gn_bias, num_groups=num_groups, eps=eps))
    dn = jax.lax.conv_dimension_numbers(
        y.shape, conv_kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    out = jax.lax.conv_general_dilated(
        y.astype(conv_kernel.dtype), conv_kernel, (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    return (out + conv_bias.astype(jnp.float32)).astype(x.dtype)


def _fwd(x, gn_scale, gn_bias, conv_kernel, conv_bias, num_groups, eps):
    out = _fused_forward(x, gn_scale, gn_bias, conv_kernel, conv_bias,
                         num_groups, eps)
    return out, (x, gn_scale, gn_bias, conv_kernel, conv_bias)


def _bwd(num_groups, eps, res, g):
    x, gn_scale, gn_bias, conv_kernel, conv_bias = res
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, num_groups, eps),
        x, gn_scale, gn_bias, conv_kernel, conv_bias,
    )
    return vjp(g)


def _fused_forward(x, gn_scale, gn_bias, conv_kernel, conv_bias,
                   num_groups, eps):
    n, h, w, c = x.shape
    o = conv_kernel.shape[-1]
    m = jnp.asarray(_group_matrix(c, num_groups))
    kern = conv_kernel.reshape(9, c, o).astype(jnp.bfloat16)
    kernel = functools.partial(
        _kernel, eps=eps, h=h, w=w, cpg=c // num_groups
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, o), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, o), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, o), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, c), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * 9 * c * o,
            bytes_accessed=n * h * w * (c + o) * x.dtype.itemsize
            + 9 * c * o * 2,
            transcendentals=n * h * w * c,
        ),
    )(x, m, gn_scale.reshape(1, c).astype(jnp.float32),
      gn_bias.reshape(1, c).astype(jnp.float32), kern,
      conv_bias.reshape(1, o).astype(jnp.float32))


fused_gn_silu_conv.defvjp(_fwd, _bwd)
