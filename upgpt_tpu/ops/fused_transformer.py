"""Fused SpatialTransformer block: one Pallas kernel per sample.

Round-2 trace (docs/PERF.md): at batch 32 the five ds=1 SpatialTransformers
cost ~15 ms of a 24.8 ms U-Net step, but only 2.7 ms of that is attention
math — the rest is layout churn between XLA's conv layouts (batch-in-
sublanes) and dot layouts (token-major): head split/merge transposes,
proj/QKV dots running at ~13 TF/s, fp32 LayerNorm islands, softmax buffer
round-trips. This kernel runs the ENTIRE transformer block per sample
inside VMEM — tokens leave HBM once and return once:

    GN32(eps 1e-6) -> proj_in -> [LN1 -> self-attn -> LN2 -> cross-attn ->
    LN3 -> GEGLU FF] -> zero-init proj_out -> + residual

matching reference attention.py:218-261 / 196-215 exactly (fp32 GN/LN/
softmax islands, exact-erf GELU, per-head scale 1/sqrt(d)). Projections run
FULL-WIDTH — Q/K/V/out as (C, C) matmuls, so the MXU lane dim is C (224/448)
instead of head_dim (28/56) — and only the score/value contractions are
per-head, on lane slices of the packed (T, C) activations. Measured on v5e
(benchmarks/micro_block.py, batch 32, T=768, C=224): fullwidth self-attn
0.32 ms vs 1.60 ms for the per-head pre-split variant this replaces.

Cross-attention K/V arrive packed (B, Tk, C), precomputed once per sample
(the sampler hoists those projections out of the DDIM scan via
precompute_cross_kv); when absent (training), the raw context enters and
K/V are projected in-kernel.

Differentiable via custom VJP: Pallas forward, recompute backward through
the jnp twin (`transformer_block_reference`) — identical math. With
use_flash on (the TPU training path), the twin's self-attention routes
through `flash_attention`, whose own custom VJP is a Pallas flash backward
(ops/flash_attention.py) — so the T^2 score/probability tensors stay out
of HBM in the backward too; only the block's matmul chain is re-derived
by XLA.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Not the physical limit (v5e VMEM is 128 MB) but a scheduling-headroom
# heuristic: past this, Mosaic loses double-buffering room and the kernel
# stops beating XLA. Calibrated so the production geometries (ds1/ds2 of
# the 256px nets, serving AND training incl. the in-kernel cross
# projection the gate now counts) qualify with margin.
_VMEM_BUDGET = 17 * 1024 * 1024

# exp2 softmax: fold log2(e) into the q scale so the VPU runs exp2 instead
# of exp. Mathematically identical softmax, and exp lowers to exp2 + a
# multiply — but MEASURED SLOWER on v5e at the dominant ds1 geometry
# (benchmarks/micro_fused_variants.py: 1.124 vs 0.186 ms/op marginal at
# spp=1; docs/PERF.md "samples-per-program / exp2" section). Default OFF;
# module-level so the micro harness can A/B it in one process.
_SOFTMAX_EXP2 = False

# Samples per kernel program: >1 merges the weight-shared matmuls (proj_in,
# qkv, attn-out, FF, proj_out) across samples — M grows S-fold — and cuts
# grid-program count. MEASURED SLOWER at ds1 (spp=2: 1.498 vs 0.186 ms/op;
# spp=4 needs >16MB scoped VMEM and still loses): the per-sample work
# already saturates the MXU at T=768, and the fatter program spills VMEM.
# Default 1 (None = auto, which picks 1); override for experimentation.
_SPP_OVERRIDE: Optional[int] = None


# ---------------------------------------------------------------- helpers


def _group_matrix(c: int, g: int) -> np.ndarray:
    m = np.zeros((c, g), np.float32)
    m[np.arange(c), np.arange(c) // (c // g)] = 1.0
    return m


def _split_heads_kernel(w: jax.Array, heads: int) -> jax.Array:
    """(C_in, H*Dh) -> (H, C_in, Dh): lane-contiguous per-head weight."""
    cin, inner = w.shape
    return w.reshape(cin, heads, inner // heads).transpose(1, 0, 2)


def _split_heads_out(w: jax.Array, heads: int) -> jax.Array:
    """(H*Dh, C) -> (H, Dh, C)."""
    inner, c = w.shape
    return w.reshape(heads, inner // heads, c)


def _ln_f32(z, scale, bias, eps: float = 1e-5):
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(z - mu), axis=-1, keepdims=True)
    return (z - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _gelu_exact(z):
    return z * 0.5 * (1.0 + jax.lax.erf(z * np.float32(1.0 / math.sqrt(2.0))))


def _erf_as(x):
    """Abramowitz & Stegun 7.1.26 erf (max abs err 1.5e-7): Mosaic has no
    erf lowering, and 1.5e-7 is far below bf16 resolution (the kernel's
    compute dtype in production)."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, pc = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + pc * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_kernel(z):
    return z * 0.5 * (1.0 + _erf_as(z * np.float32(1.0 / math.sqrt(2.0))))


# ---------------------------------------------------------------- kernel


_LOG2E = float(np.log2(math.e))


def _block_kernel(
    x_ref, m_ref,
    gn_s, gn_b, wpi, bpi,
    ln1_s, ln1_b, wq, wo, bo,
    ln2_s, ln2_b, wq2, ck_ref, cv_ref, wo2, bo2,
    ln3_s, ln3_b, w1, b1, w2, b2,
    wpo, bpo,
    *rest,
    heads: int, scale: float, gn_eps: float, cnt: float,
    kv_precomputed: bool, ff_tile: int, exp2: bool,
):
    if kv_precomputed:
        (o_ref,) = rest
        wk2_ref = wv2_ref = None
    else:
        wk2_ref, wv2_ref, o_ref = rest
    comp = x_ref.dtype
    xs = x_ref[...]  # (S, T, C) in compute dtype; residual stream stays comp
    s_n, t, c = xs.shape
    tm = s_n * t  # merged token-stream length
    x = xs.reshape(tm, c)

    def mm(a, w):
        return jnp.dot(a.astype(comp), w.astype(comp),
                       preferred_element_type=jnp.float32)

    # --- GroupNorm32 (eps 1e-6): matmul group stats, fp32, PER SAMPLE ---
    m = m_ref[...]
    gn_rows = []
    for si in range(s_n):
        xf = x[si * t:(si + 1) * t].astype(jnp.float32)
        s1 = jnp.dot(jnp.sum(xf, axis=0, keepdims=True), m,
                     preferred_element_type=jnp.float32) / cnt
        s2 = jnp.dot(jnp.sum(xf * xf, axis=0, keepdims=True), m,
                     preferred_element_type=jnp.float32) / cnt
        inv = jax.lax.rsqrt(jnp.maximum(s2 - s1 * s1, 0.0) + gn_eps)
        mean_c = jnp.dot(s1, m.T, preferred_element_type=jnp.float32)
        inv_c = jnp.dot(inv, m.T, preferred_element_type=jnp.float32)
        gn_rows.append(
            ((xf - mean_c) * inv_c * gn_s[...] + gn_b[...]).astype(comp))
    gn = jnp.concatenate(gn_rows, axis=0) if s_n > 1 else gn_rows[0]

    def ln_c(z, s_, b_):
        # fp32 LayerNorm island, result back in compute dtype (same as the
        # XLA twin: bf16 residual stream, fp32 normalization statistics)
        return _ln_f32(z.astype(jnp.float32), s_[...], b_[...]).astype(comp)

    dh = c // heads
    # exp2 softmax: log2(e) pre-folded into the q scale; 2^(s*log2e) ==
    # e^s, so the softmax is unchanged in real arithmetic and the VPU
    # skips exp's per-element multiply on the (T, Tk) score blocks.
    q_scale = scale * _LOG2E if exp2 else scale
    ex = jnp.exp2 if exp2 else jnp.exp

    def attend_one(q_all, k_all, v_all):
        # q/k/v packed (T|Tk, C); per-head score/value contractions on lane
        # slices — the only matmuls whose MXU occupancy head_dim caps.
        outs = []
        for hh in range(heads):
            lo = hh * dh
            s = jax.lax.dot_general(
                q_all[:, lo:lo + dh], k_all[:, lo:lo + dh],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = ex(s - jnp.max(s, axis=-1, keepdims=True))
            # deferred normalization: divide the (T, Dh) output instead of
            # the (T, Tk) probabilities — one VPU pass Tk/Dh x smaller
            o = jnp.dot(p.astype(comp), v_all[:, lo:lo + dh],
                        preferred_element_type=jnp.float32)
            outs.append(o * pl.reciprocal(
                jnp.sum(p, axis=-1, keepdims=True)))
        return jnp.concatenate(outs, axis=-1).astype(comp)

    def attention(q_m, k_per, v_per, wo_full, bo_r, base):
        # q merged (S*T, C); k/v as per-sample (Tk, C) lookups
        rows = [attend_one(q_m[si * t:(si + 1) * t], k_per(si), v_per(si))
                for si in range(s_n)]
        o = jnp.concatenate(rows, axis=0) if s_n > 1 else rows[0]
        acc = mm(o, wo_full[...]) + bo_r[...] + base.astype(jnp.float32)
        return acc.astype(comp)

    # --- proj_in (merged across samples: weight-shared matmul) ---
    h = (mm(gn, wpi[...]) + bpi[...]).astype(comp)

    # --- self-attention (q/k/v via ONE (C, 3C) matmul; 1/sqrt(d) folded
    # into q: one (T, C) fp32 mul instead of H (T, Tk) muls) ---
    a = ln_c(h, ln1_s, ln1_b)
    qkv = mm(a, wq[...])  # wq carries packed [Wq|Wk|Wv], (C, 3C)
    q_m = (qkv[:, :c] * q_scale).astype(comp)
    k_m = qkv[:, c:2 * c].astype(comp)
    v_m = qkv[:, 2 * c:].astype(comp)
    h = attention(q_m,
                  lambda si: k_m[si * t:(si + 1) * t],
                  lambda si: v_m[si * t:(si + 1) * t], wo, bo, h)

    # --- cross-attention ---
    a = ln_c(h, ln2_s, ln2_b)
    if kv_precomputed:
        k_per = lambda si: ck_ref[si]
        v_per = lambda si: cv_ref[si]
    else:
        tk, cd = ck_ref.shape[1], ck_ref.shape[2]
        ctx_m = ck_ref[...].reshape(s_n * tk, cd)
        k_m2 = mm(ctx_m, wk2_ref[...]).astype(comp)
        v_m2 = mm(ctx_m, wv2_ref[...]).astype(comp)
        k_per = lambda si: k_m2[si * tk:(si + 1) * tk]
        v_per = lambda si: v_m2[si * tk:(si + 1) * tk]
    h = attention((mm(a, wq2[...]) * q_scale).astype(comp),
                  k_per, v_per, wo2, bo2, h)

    # --- GEGLU FF (T-tiled only when the (T, 8C) intermediate is large) ---
    a = ln_c(h, ln3_s, ln3_b)
    inner = w1.shape[-1] // 2
    rows = []
    for i in range(tm // ff_tile):
        g = mm(a[i * ff_tile:(i + 1) * ff_tile], w1[...]) + b1[...]
        xh, gate = g[:, :inner], g[:, inner:]
        rows.append(mm((xh * _gelu_kernel(gate)).astype(comp), w2[...]))
    ff = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    h = (h.astype(jnp.float32) + ff + b2[...]).astype(comp)

    # --- zero-init proj_out + outer residual ---
    o_ref[...] = (mm(h, wpo[...]) + bpo[...]
                  + x.astype(jnp.float32)).astype(o_ref.dtype).reshape(
                      s_n, t, c)


# ---------------------------------------------------------------- jnp twin


def _dense(z, tree, bias=True):
    out = z @ tree["kernel"].astype(z.dtype)
    if bias and "bias" in tree:
        out = out + tree["bias"].astype(out.dtype)
    return out


def _ln_tree(z, tree):
    return _ln_f32(
        z.astype(jnp.float32), tree["scale"].astype(jnp.float32),
        tree["bias"].astype(jnp.float32),
    ).astype(z.dtype)


def _basic_block_ref(h, blk, heads, context, kv, use_flash):
    """One BasicTransformerBlock (reference attention.py:196-215) in jnp."""
    from upgpt_tpu.ops.attention import attention_weight_split
    from upgpt_tpu.ops.flash_attention import flash_attention_qualifies

    comp = h.dtype
    b, tq, c = h.shape
    d = c // heads
    z = _ln_tree(h, blk["norm1"])
    a1 = blk["attn1"]
    if use_flash and flash_attention_qualifies(b, heads, tq, tq, d, comp):
        # project per-head straight from the weights so q/k/v are BORN
        # (B, H, T, D) — the pack->reshape->transpose chain around the
        # flash call repacked ~44 MB per tensor at the 512px T=3072 blocks
        from upgpt_tpu.ops.flash_attention import flash_attention

        def headed(w):
            kern = w["kernel"].astype(comp)
            return jnp.einsum("btc,chd->bhtd", z,
                              kern.reshape(kern.shape[0], heads, d))

        o = flash_attention(headed(a1["to_q"]), headed(a1["to_k"]),
                            headed(a1["to_v"]))
        wo = a1["to_out"]["kernel"].astype(comp)
        h = h + (jnp.einsum("bhtd,hdc->btc", o,
                            wo.reshape(heads, d, wo.shape[-1]))
                 + a1["to_out"]["bias"].astype(comp))
    else:
        # XLA path: head split on the weights, so the (B, T, H*D)
        # activations are never physically repacked (docs/PERF.md round 3:
        # the 896ch ds4/mid levels spent ~0.4 ms/step on those copies)
        h = h + attention_weight_split(z, None, a1, heads)
    z = _ln_tree(h, blk["norm2"])
    a2 = blk["attn2"]
    src = z if context is None else context.astype(comp)
    h = h + attention_weight_split(z, src if kv is None else None, a2,
                                   heads, kv=kv)
    z = _ln_tree(h, blk["norm3"])
    g = _dense(z, blk["ff"]["proj_in"])
    xh, gate = jnp.split(g, 2, axis=-1)
    act = (xh.astype(jnp.float32) *
           _gelu_exact(gate.astype(jnp.float32))).astype(comp)
    return h + _dense(act, blk["ff"]["proj_out"])


def transformer_block_reference(
    x_tokens: jax.Array,
    p: Dict,
    heads: int,
    context: Optional[jax.Array] = None,
    kv=None,
    gn_eps: float = 1e-6,
    use_flash: bool = False,
) -> jax.Array:
    """jnp twin: identical math on any backend (it IS the reference
    SpatialTransformer graph, attention.py:218-261). Serves as the XLA
    fallback forward and the fused kernel's VJP-recompute backward.

    `kv` is a (k, v) tuple for block_0 or a {block_i: (k, v)} dict.
    """
    from upgpt_tpu.ops.basic import group_norm

    comp = x_tokens.dtype
    h = group_norm(x_tokens, p["norm"]["scale"], p["norm"]["bias"],
                   num_groups=32, eps=gn_eps)
    h = _dense(h.astype(comp), p["proj_in"])
    names = sorted((k for k in p if k.startswith("block_")),
                   key=lambda s: int(s.split("_")[1]))
    for name in names:
        if isinstance(kv, dict):
            blk_kv = kv.get(name)
        else:
            blk_kv = kv if name == "block_0" else None
        h = _basic_block_ref(h, p[name], heads, context, blk_kv, use_flash)
    return _dense(h, p["proj_out"]) + x_tokens


# ---------------------------------------------------------------- wrapper


def _ff_tile(t: int, c: int) -> int:
    """FF row-tile: the whole T when the f32 (T, 8C) intermediate fits in
    ~6 MB, else the largest divisor of T that is <= 256 (T % 8 == 0 is
    guaranteed by the qualify gate, so a divisor always exists — a
    non-divisor tile would silently drop T % tile rows)."""
    if t * 8 * c * 4 <= 6 * 1024 * 1024:
        return t
    return next(d for d in range(256, 0, -1) if t % d == 0)


def _vmem_estimate(t: int, c: int, tk: int, spp: int,
                   kv_precomputed: bool, ctx_dim: Optional[int]) -> int:
    """Mirror of the qualify gate's budget arithmetic, parameterized by
    samples-per-program: weights once, per-sample work x spp, FF tile on
    the merged row stream."""
    weights = (6 * c * c + 2 * 8 * c * c + c * c) * 2  # qkv/o x2 + ff + proj
    per_sample = 5 * t * c * 4 + t * t * 4 + 3 * tk * c * 4
    work = spp * per_sample + _ff_tile(spp * t, c) * 8 * c * 4
    if not kv_precomputed:
        cd = ctx_dim or c
        weights += 2 * cd * c * 2  # wk2/wv2, bf16
        work += spp * tk * cd * 4  # raw context blocks
    return weights + work


def _pick_spp(b: int, t: int, c: int, tk: int, kv_precomputed: bool,
              ctx_dim: Optional[int]) -> int:
    """Default samples-per-program. On-chip A/B (micro_fused_variants.py,
    v5e, ds1 T=768 C=224 batch 32): spp=2 ran 1.498 ms/op vs spp=1's
    0.186 — the merged program spills VMEM and the per-sample matmuls
    already saturate the MXU at this M. Auto therefore always picks 1;
    the spp>1 machinery stays for _SPP_OVERRIDE experiments (it is
    numerically identical, see test_spp_batched_program_matches_twin)."""
    del b, t, c, tk, kv_precomputed, ctx_dim
    return 1


def fused_transformer_qualifies(t: int, c: int, heads: int, tk: int,
                                depth: int = 1,
                                kv_precomputed: bool = True,
                                ctx_dim: Optional[int] = None) -> bool:
    """VMEM-feasibility gate: ds1/ds2 of the 256px nets qualify; the 896ch
    mid level (13 MB of FF weights alone) and T>1024 fall back to XLA.
    `kv_precomputed=False` (the training path, context projected in-kernel)
    additionally budgets the wk2/wv2 weights and the raw context block."""
    if depth != 1 or c % heads or c % 32 or heads * (c // heads) != c:
        return False
    if t > 1024 or c > 512 or t % 8:
        return False
    weights = (6 * c * c + 2 * 8 * c * c + c * c) * 2  # qkv/o x2 + ff + proj
    work = (5 * t * c * 4 + t * t * 4 + _ff_tile(t, c) * 8 * c * 4
            + 3 * tk * c * 4)  # cross K/V blocks + (T,Tk) scores margin
    if not kv_precomputed:
        cd = ctx_dim or c
        weights += 2 * cd * c * 2  # wk2/wv2, bf16
        work += tk * cd * 4  # raw context block
    return weights + work <= _VMEM_BUDGET


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 5, 6))
def fused_transformer_block(x_tokens, p, heads, context=None, kv=None,
                            gn_eps: float = 1e-6, use_flash: bool = False):
    """(B, T, C) tokens -> (B, T, C): the full SpatialTransformer block."""
    return _fused_forward(x_tokens, p, heads, context, kv, gn_eps)


def _fused_fwd(x_tokens, p, heads, context, kv, gn_eps, use_flash):
    out = _fused_forward(x_tokens, p, heads, context, kv, gn_eps)
    return out, (x_tokens, p, context, kv)


def _fused_bwd(heads, gn_eps, use_flash, res, g):
    x_tokens, p, context, kv = res

    def f(x_, p_, c_, kv_):
        return transformer_block_reference(
            x_, p_, heads, c_, kv_, gn_eps, use_flash=use_flash)

    _, vjp = jax.vjp(f, x_tokens, p, context, kv)
    return vjp(g)


fused_transformer_block.defvjp(_fused_fwd, _fused_bwd)


def _fused_forward(x_tokens, p, heads, context, kv, gn_eps):
    b, t, c = x_tokens.shape
    dh = c // heads
    comp = x_tokens.dtype
    blk = p["block_0"]
    a1, a2, ff = blk["attn1"], blk["attn2"], blk["ff"]

    def w(tree):
        return tree["kernel"].astype(comp)

    def bvec(tree):
        return tree["bias"].astype(jnp.float32).reshape(1, -1)

    def svec(tree, key):
        return tree[key].astype(jnp.float32).reshape(1, -1)

    kv_pre = kv is not None
    extra_inputs, extra_specs = [], []
    if kv_pre:
        ck, cv = kv
        tk = ck.shape[1]
        # packed (B, Tk, C) straight from precompute_cross_kv: the kernel
        # slices per-head lanes, no head transpose anywhere
        ck_in = ck.astype(comp)
        cv_in = cv.astype(comp)
    else:
        assert context is not None, "fused path needs context or kv"
        tk = context.shape[1]
        ck_in = context.astype(comp)
        cv_in = jnp.zeros((b, 8, 8), comp)  # unused placeholder
        extra_inputs = [w(a2["to_k"]), w(a2["to_v"])]

    ctx_dim = None if context is None else context.shape[-1]
    spp = _SPP_OVERRIDE or _pick_spp(b, t, c, tk, kv_pre, ctx_dim)
    if b % spp:
        # grid=(b // spp,) would silently skip the trailing b % spp samples
        raise ValueError(
            f"_SPP_OVERRIDE={spp} does not divide batch {b}; the grid would "
            f"leave {b % spp} samples' output blocks unwritten")
    # Mosaic's default scoped-VMEM limit is 16 MB; a multi-sample program
    # legitimately needs more (measured 24.3 MB at the training ds1
    # geometry, spp=2). Raise the per-kernel cap from the estimate with
    # the empirically observed 1.4x estimate->actual factor plus margin —
    # v5e has 128 MB physical VMEM, so 32-48 MB scoped is safe.
    vmem_limit = min(
        100 * 1024 * 1024,
        max(16 * 1024 * 1024,
            int(_vmem_estimate(t, c, tk, spp, kv_pre, ctx_dim) * 1.7)
            + 2 * 1024 * 1024))

    rep = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    per_b = lambda shape: pl.BlockSpec(
        (spp,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    if not kv_pre:
        extra_specs = [rep(tuple(a.shape)) for a in extra_inputs]

    w1k = ff["proj_in"]["kernel"]
    w2k = ff["proj_out"]["kernel"]
    inputs = [
        x_tokens, jnp.asarray(_group_matrix(c, 32)),
        svec(p["norm"], "scale"), svec(p["norm"], "bias"),
        w(p["proj_in"]), bvec(p["proj_in"]),
        svec(blk["norm1"], "scale"), svec(blk["norm1"], "bias"),
        jnp.concatenate(
            [w(a1["to_q"]), w(a1["to_k"]), w(a1["to_v"])], axis=1),
        w(a1["to_out"]), bvec(a1["to_out"]),
        svec(blk["norm2"], "scale"), svec(blk["norm2"], "bias"),
        w(a2["to_q"]),
        ck_in, cv_in,
        w(a2["to_out"]), bvec(a2["to_out"]),
        svec(blk["norm3"], "scale"), svec(blk["norm3"], "bias"),
        w1k.astype(comp), bvec(ff["proj_in"]),
        w2k.astype(comp), bvec(ff["proj_out"]),
        w(p["proj_out"]), bvec(p["proj_out"]),
    ] + extra_inputs
    in_specs = [
        per_b((t, c)), rep((c, 32)),
        rep((1, c)), rep((1, c)),
        rep((c, c)), rep((1, c)),
        rep((1, c)), rep((1, c)),
        rep((c, 3 * c)),
        rep((c, c)), rep((1, c)),
        rep((1, c)), rep((1, c)),
        rep((c, c)),
        per_b(tuple(ck_in.shape[1:])), per_b(tuple(cv_in.shape[1:])),
        rep((c, c)), rep((1, c)),
        rep((1, c)), rep((1, c)),
        rep(tuple(w1k.shape)), rep((1, w1k.shape[-1])),
        rep(tuple(w2k.shape)), rep((1, c)),
        rep((c, c)), rep((1, c)),
    ] + extra_specs

    # tile FF over the MERGED (spp*T) row stream; tiled only when the f32
    # (rows, 8C) intermediate would exceed ~6 MB
    ff_tile = _ff_tile(spp * t, c)
    kernel = functools.partial(
        _block_kernel, heads=heads, scale=1.0 / math.sqrt(dh),
        gn_eps=gn_eps, cnt=float(t * (c // 32)), kv_precomputed=kv_pre,
        ff_tile=ff_tile, exp2=_SOFTMAX_EXP2,
    )
    flops = (4 * b * heads * t * (t + tk) * dh
             + 2 * b * t * c * (2 * c + 12 * c))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, c), comp),
        grid=(b // spp,),
        in_specs=in_specs,
        out_specs=per_b((t, c)),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * b * t * c * x_tokens.dtype.itemsize,
            transcendentals=b * heads * t * (t + tk) + 4 * b * t * c,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(*inputs)
