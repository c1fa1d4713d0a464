"""Pallas TPU attention kernel for the U-Net's long self-attention paths.

Design notes (TPU-first, not a port — the reference computes full O(N^2)
einsum attention in torch, attention.py:180-192):

The UPGPT workload has two attention regimes:
- short sequences (48-768 latent tokens at 256px, 87-163 context tokens):
  XLA's fused einsum+softmax is already near roofline; a custom kernel buys
  nothing, so `flash_attention_qualifies` rejects these.
- long self-attention (3072 latent tokens for the 512px / upscale models,
  head_dim 64-256): the (3072, 3072) fp32 score tensor round-trips HBM under
  XLA. This kernel blocks over queries, keeps K/V resident in VMEM (T <= 4096
  always holds for this model family), computes scores in fp32 on the MXU and
  never materializes them in HBM.

Layout: (B, H, T, D) with B*H folded into the grid's first axis; D padded to
a multiple of 128 lanes by the wrapper. Softmax is numerically exact (full-row
max/sum — no online rescaling needed because the whole key axis is resident).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# exp2 softmax: log2(e) folded into the score scale so the VPU runs exp2
# directly (exp lowers to exp2 + one extra multiply pass over the (Bq, T)
# score block). 2^(x*log2e) == e^x, so softmax values are unchanged.
_LOG2E = math.log2(math.e)
_MAX_RESIDENT_T = 4096  # K/V stay VMEM-resident; beyond this, fall back to XLA.


def flash_attention_qualifies(b: int, h: int, tq: int, tk: int, d: int, dtype) -> bool:
    """True when the Pallas path is both legal and profitable.

    Profiling on v5e showed XLA's materialized fp32 score tensors dominate
    the U-Net step already at T=768 (the 256px models' ds=1 grid): the
    softmax+score HBM round-trips cost ~5.5 ms of a 10.5 ms forward. The
    kernel pays off from T>=512; shorter sequences (48-192 latent tokens,
    87-163 context tokens) stay on XLA.
    """
    if dtype not in (jnp.bfloat16, jnp.float32):
        return False
    if tq != tk or tq < 512 or tk > _MAX_RESIDENT_T:
        return False
    if tq % 256 != 0:
        return False
    return d <= 512


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (Bq, D)
    k = k_ref[0]  # (T, D)
    v = v_ref[0]  # (T, D)
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Bq, T)
    scores = scores * (scale * _LOG2E)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp2(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    # deferred normalization: divide the (Bq, D) output, not the (Bq, T)
    # probabilities — one VPU pass T/D x smaller
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / denom).astype(o_ref.dtype)


@jax.custom_vjp
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Attention over (B, H, T, D) tensors; returns (B, H, T, D).

    Scale is 1/sqrt(D_logical) applied to fp32 scores inside the kernel
    (same math as the reference's two conventions; see ops/attention.py).

    Differentiable: the forward runs the Pallas kernel; the backward runs a
    blocked two-pass Pallas kernel (dQ then dK/dV) for every shape the
    forward qualifies, so the T^2 score/probability/dS intermediates never
    touch HBM in training either. Non-kernel shapes fall back to the XLA
    recompute formulation (numerically identical math).
    """
    return _flash_forward(q, k, v)


def _reference_attention(q, k, v):
    d = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(d))
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _attn_bwd_dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref,
                        dq_ref, l_ref, di_ref, *, scale: float):
    """Blocked backward, pass 1: dQ for one q-block against resident K/V.

    Also emits the per-query softmax stats the dK/dV pass needs — the
    logsumexp L (so pass 2 can rebuild normalized probabilities without a
    row reduction over the full key axis) and Di = rowsum(dO * O).
    """
    f32 = jnp.float32
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    o = o_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * (scale * _LOG2E)  # (Bq, T), log2-space scores
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)  # == e^(s_nat - m_nat): values identical
    denom = jnp.sum(p, axis=-1, keepdims=True)
    recip = 1.0 / denom
    di = jnp.sum(do.astype(f32) * o.astype(f32), axis=-1, keepdims=True)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    ds = p * ((dp - di) * recip)
    dq = jax.lax.dot_general(
        ds.astype(q.dtype), k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    # stats rows live as (bh, 1, t) so the (1, 1, block) block shape meets
    # Mosaic's (sublane % 8 or full-dim, lane % 128) block constraint.
    # LSE is in LOG2 space (m is a log2-score max): pass 2 rebuilds the
    # normalized probabilities as exp2(st2 - L2).
    l_ref[0, 0] = jnp.squeeze(m + jnp.log2(denom), -1)
    di_ref[0, 0] = jnp.squeeze(di, -1)


def _attn_bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, l_ref, di_ref,
                         dk_ref, dv_ref, *, scale: float):
    """Blocked backward, pass 2: dK/dV for one k-block against resident
    Q/dO, using the stats of pass 1. exp(s - L) IS the normalized
    probability, so no per-query reduction is needed here."""
    f32 = jnp.float32
    k = k_ref[0]
    v = v_ref[0]
    q = q_ref[0]
    do = do_ref[0]
    l_row = l_ref[0]   # (1, Tq)
    di_row = di_ref[0]
    st = jax.lax.dot_general(
        k, q, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) * (scale * _LOG2E)  # (Bk, Tq), log2-space (matches pass 1's L2 stat)
    pn_t = jnp.exp2(st - l_row)
    dv = jax.lax.dot_general(
        pn_t.astype(do.dtype), do,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dp_t = jax.lax.dot_general(
        v, do, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )  # (Bk, Tq)
    ds_t = pn_t * (dp_t - di_row)
    dk = jax.lax.dot_general(
        ds_t.astype(q.dtype), q, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) * scale
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward_blocked(q, k, v, o, do, block: int):
    """Two-pass blocked flash backward for long T (3072 at 512px): the
    (T, T) intermediates only ever exist block-row by block-row in VMEM.
    (XLA's recompute backward materializes ~2.4 GB of fp32 scores per
    transformer layer at the mm_512 training geometry, b=8.)"""
    b, h, t, d = q.shape
    scale = 1.0 / math.sqrt(d)
    bh = b * h
    flat = lambda x: x.reshape(bh, t, d)
    qf, kf, vf, of, dof = map(flat, (q, k, v, o, do))
    blk = lambda: pl.BlockSpec((1, block, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    row_blk = pl.BlockSpec((1, 1, block), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
    row_full = pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid = (bh, t // block)
    dq, lse, di = pl.pallas_call(
        functools.partial(_attn_bwd_dq_kernel, scale=scale),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
            jax.ShapeDtypeStruct((bh, 1, t), jnp.float32),
        ],
        grid=grid,
        in_specs=[blk(), full(), full(), blk(), blk()],
        out_specs=[blk(), row_blk, row_blk],
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * t * t * d,
            bytes_accessed=5 * bh * t * d * q.dtype.itemsize,
            transcendentals=bh * t * t,
        ),
    )(qf, kf, vf, of, dof)
    dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_dkv_kernel, scale=scale),
        out_shape=[jax.ShapeDtypeStruct((bh, t, d), x.dtype) for x in (k, v)],
        grid=grid,
        in_specs=[blk(), blk(), full(), full(), row_full, row_full],
        out_specs=[blk(), blk()],
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * t * t * d,  # st, dv, dp_t, dk matmuls
            bytes_accessed=(6 * bh * t * d * q.dtype.itemsize
                            + 2 * bh * t * 4),
            transcendentals=bh * t * t,
        ),
    )(kf, vf, qf, dof, lse, di)
    unflat = lambda x: x.reshape(b, h, t, d)
    return unflat(dq), unflat(dk), unflat(dv)


def _flash_fwd_rule(q, k, v):
    o = _flash_forward(q, k, v)
    return o, (q, k, v, o)


def _bwd_blocked_fits(t: int, d: int, itemsize: int, block: int = 256) -> bool:
    """VMEM budget for one blocked-backward program: double-buffered
    resident K/V (or Q/dO in pass 2), ~2 live fp32 (block, T) score-row
    buffers, and the double-buffered (block, d) tiles. Calibrated against
    measured points: (3072, 32, bf16) compiles and runs (~10 MB by this
    model); the 16 MB scoped limit with margin -> 12 MB gate. Large-d f32
    shapes (e.g. a flash VAE AttnBlock at T=1024, d=512) fall back to the
    XLA recompute backward instead of failing Mosaic compilation."""
    d_pad = ((d + _LANES - 1) // _LANES) * _LANES
    vmem = (2 * 2 * t * d_pad * itemsize      # resident pair, double-buffered
            + 2 * block * t * 4               # live fp32 score rows
            + 4 * 2 * block * d_pad * itemsize)  # per-block tiles
    return vmem <= 12 * 1024 * 1024


def _flash_bwd_rule(res, g):
    q, k, v, o = res
    b, h, t, d = q.shape
    if (t <= _MAX_RESIDENT_T and t % 256 == 0
            and _bwd_blocked_fits(t, d, q.dtype.itemsize)):
        # a single-block whole-row variant measured VMEM-over-budget (18 MB
        # scoped stack at T=768/d=28/bs12), so every kernel-backward shape
        # goes through the blocked two-pass kernel.
        return _flash_backward_blocked(q, k, v, o, g, block=256)
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


def _attn_kernel_headloop(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                          heads: int):
    # one program = all heads of one sample's q-block: 16x fewer programs
    # and 16x larger DMAs than the (b*h, t/block_q) grid
    for hh in range(heads):
        q = q_ref[0, hh]  # (Bq, D)
        k = k_ref[0, hh]  # (T, D)
        v = v_ref[0, hh]
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (scale * _LOG2E)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp2(scores - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, hh] = (o / denom).astype(o_ref.dtype)


def _flash_forward_headloop(q, k, v, block_q: int) -> jax.Array:
    b, h, t, d = q.shape
    scale = 1.0 / math.sqrt(d)
    grid = (b, t // block_q)
    return pl.pallas_call(
        functools.partial(_attn_kernel_headloop, scale=scale, heads=h),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, block_q, d), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, t, d), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, t, d), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, block_q, d), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * t * d,
            bytes_accessed=b * h * t * d * 4 * q.dtype.itemsize,
            transcendentals=b * h * t * t,
        ),
    )(q, k, v)


def _flash_forward(q: jax.Array, k: jax.Array, v: jax.Array,
                   block_q: int = 0) -> jax.Array:
    b, h, t, d = q.shape
    if block_q == 0:
        # v5e measurements at (32, 8, 768, 28), ms/op marginal: headloop
        # full-T 0.63 < grid_bh full-T 0.78 < grid_bh 384 0.89 < XLA 1.76.
        # The headloop grid (one program per sample, all heads inside) wins
        # on DMA size/count; its VMEM footprint only fits for short T.
        # Budget counts Mosaic's double-buffering of every block (x2 on the
        # q/k/v/o arrays) plus two live fp32 score buffers — the deferred-
        # normalization kernel keeps s and p alive across the PV matmul
        # (measured 18.02 MB scoped stack at (12, 8, 768, 28) bf16, over
        # the 16 MB limit; the blocked grid path handles that shape).
        d_pad = ((d + 127) // 128) * 128
        vmem = 2 * (4 * h * t * d_pad * q.dtype.itemsize) + 2 * t * t * 4
        if t <= 1024 and vmem <= 12 * 1024 * 1024:
            return _flash_forward_headloop(q, k, v, t)
        # 384 measured fastest on v5e for T=768 (vs 256/768); fall back to
        # 256 for sequences it doesn't divide
        block_q = 384 if t % 384 == 0 else 256
    scale = 1.0 / math.sqrt(d)
    # No host-side lane padding: Mosaic pads d inside VMEM. Measured on v5e
    # (d=28, T=768, b=32): 22 ms vs 29 ms for the pre-padded variant — the
    # XLA pad op and the 4.6x-inflated HBM traffic of padded q/k/v vanish.
    bh = b * h
    qf = q.reshape(bh, t, d)
    kf = k.reshape(bh, t, d)
    vf = v.reshape(bh, t, d)

    grid = (bh, t // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t * t * d,
            bytes_accessed=bh * t * d * 4 * q.dtype.itemsize,
            transcendentals=bh * t * t,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, t, d)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
