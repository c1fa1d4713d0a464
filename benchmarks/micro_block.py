"""Microbench the fused transformer block kernel variants at ds=1 geometry.

Variants:
  - current:   per-head pre-split weights (H, C, Dh), 3*H+H small matmuls
  - fullwidth: one (C, C) matmul per projection, per-head lane slices in VMEM
  - xla twin:  transformer_block_reference (the unfused path)

Marginal-cost timing (chained scan) to cancel tunnel dispatch latency.
"""

import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from upgpt_tpu.models.unet import SpatialTransformer
    from upgpt_tpu.ops import fused_transformer as ft

    B, T, C, HEADS, TK = 32, 768, 224, 8, 87
    DH = C // HEADS
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)) * 0.1, dt)
    ctx = jnp.asarray(rng.normal(size=(B, TK, C)), dt)

    mod = SpatialTransformer(C, HEADS, DH, context_dim=C)
    params = mod.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 24, 32, C)), jnp.zeros((1, TK, C)))["params"]
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.03, dt), params)
    a2 = params["block_0"]["attn2"]
    kv = (ctx @ a2["to_k"]["kernel"], ctx @ a2["to_v"]["kernel"])

    # ---- fullwidth-qkv kernel variant (self-attn only differs) ----
    def fw_kernel(x_ref, wq, wk, wv, wo, bo, o_ref, *, heads, scale):
        comp = x_ref.dtype
        a = x_ref[0]
        t, c = a.shape
        dh = c // heads
        qa = jnp.dot(a, wq[...], preferred_element_type=jnp.float32).astype(comp)
        ka = jnp.dot(a, wk[...], preferred_element_type=jnp.float32).astype(comp)
        va = jnp.dot(a, wv[...], preferred_element_type=jnp.float32).astype(comp)
        outs = []
        for hh in range(heads):
            q = qa[:, hh * dh:(hh + 1) * dh]
            k = ka[:, hh * dh:(hh + 1) * dh]
            v = va[:, hh * dh:(hh + 1) * dh]
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(comp)
            outs.append(jnp.dot(p, v, preferred_element_type=jnp.float32)
                        .astype(comp))
        o = jnp.concatenate(outs, axis=-1)
        o_ref[0] = (jnp.dot(o, wo[...], preferred_element_type=jnp.float32)
                    + bo[...]).astype(o_ref.dtype)

    def fw_attn(xt, p):
        a1 = p["block_0"]["attn1"]
        rep = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                     memory_space=pltpu.VMEM)
        per_b = lambda s: pl.BlockSpec((1,) + s, lambda i: (i,) + (0,) * len(s),
                                       memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(fw_kernel, heads=HEADS, scale=1 / math.sqrt(DH)),
            out_shape=jax.ShapeDtypeStruct((B, T, C), xt.dtype),
            grid=(B,),
            in_specs=[per_b((T, C)), rep((C, C)), rep((C, C)), rep((C, C)),
                      rep((C, C)), rep((1, C))],
            out_specs=per_b((T, C)),
        )(xt, a1["to_q"]["kernel"], a1["to_k"]["kernel"], a1["to_v"]["kernel"],
          a1["to_out"]["kernel"],
          a1["to_out"]["bias"].astype(jnp.float32).reshape(1, -1))

    # ---- per-head self-attn-only kernel (isolate attention cost) ----
    def ph_kernel(x_ref, wq, wk, wv, wo, bo, o_ref, *, heads, scale):
        comp = x_ref.dtype
        a = x_ref[0]
        acc = bo[...]
        for hh in range(heads):
            q = jnp.dot(a, wq[hh], preferred_element_type=jnp.float32).astype(comp)
            k = jnp.dot(a, wk[hh], preferred_element_type=jnp.float32).astype(comp)
            v = jnp.dot(a, wv[hh], preferred_element_type=jnp.float32).astype(comp)
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(comp)
            o = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(comp)
            acc = acc + jnp.dot(o, wo[hh], preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(o_ref.dtype)

    def ph_attn(xt, p):
        a1 = p["block_0"]["attn1"]
        rep = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s),
                                     memory_space=pltpu.VMEM)
        per_b = lambda s: pl.BlockSpec((1,) + s, lambda i: (i,) + (0,) * len(s),
                                       memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(ph_kernel, heads=HEADS, scale=1 / math.sqrt(DH)),
            out_shape=jax.ShapeDtypeStruct((B, T, C), xt.dtype),
            grid=(B,),
            in_specs=[per_b((T, C)),
                      rep((HEADS, C, DH)), rep((HEADS, C, DH)),
                      rep((HEADS, C, DH)), rep((HEADS, DH, C)), rep((1, C))],
            out_specs=per_b((T, C)),
        )(xt,
          ft._split_heads_kernel(a1["to_q"]["kernel"], HEADS),
          ft._split_heads_kernel(a1["to_k"]["kernel"], HEADS),
          ft._split_heads_kernel(a1["to_v"]["kernel"], HEADS),
          ft._split_heads_out(a1["to_out"]["kernel"], HEADS),
          a1["to_out"]["bias"].astype(jnp.float32).reshape(1, -1))

    variants = {
        "fused_full_block": lambda xt: ft.fused_transformer_block(
            xt, params, HEADS, None, kv),
        "selfattn_perhead": lambda xt: ph_attn(xt, params),
        "selfattn_fullwidth": lambda xt: fw_attn(xt, params),
        "xla_twin": lambda xt: ft.transformer_block_reference(
            xt, params, HEADS, None, kv),
    }

    n_short, n_long = 10, 60
    for name, fn in variants.items():
        def chained(xt, n, fn=fn):
            def body(c, _):
                return fn(c).astype(c.dtype), ()
            out, _ = jax.lax.scan(body, xt, None, length=n)
            return out

        js = jax.jit(lambda a, fn=fn: chained(a, n_short, fn))
        jl = jax.jit(lambda a, fn=fn: chained(a, n_long, fn))
        try:
            np.asarray(js(x)); np.asarray(jl(x))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        ts, tl = [], []
        for _ in range(5):
            t0 = time.perf_counter(); np.asarray(js(x)); ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); np.asarray(jl(x)); tl.append(time.perf_counter() - t0)
        per = (min(tl) - min(ts)) / (n_long - n_short) * 1000
        print(f"{name}: {per:.3f} ms/op marginal")


if __name__ == "__main__":
    main()
