"""Microbench the ds=4 mid SpatialTransformer (T=48, C=896) variants.

The fused Pallas kernel skips this geometry (FF weights alone are 19 MB >
VMEM), so it runs through the jnp twin. Trace shows its dots lowering as
batched-layout "convolution fusions" at ~7x off roofline; candidate fix is
flattening (B, T, C) -> (B*T, C) for every dense op so XLA emits plain 2D
matmuls.

Usage: python benchmarks/micro_mid.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from upgpt_tpu.models.unet import SpatialTransformer
    from upgpt_tpu.ops import fused_transformer as ft

    B, T, C, HEADS, TK = 32, 48, 896, 8, 87
    DH = C // HEADS
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)) * 0.1, dt)
    ctx = jnp.asarray(rng.normal(size=(B, TK, C)), dt)

    mod = SpatialTransformer(C, HEADS, DH, context_dim=C)
    params = mod.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 6, C)), jnp.zeros((1, TK, C)))["params"]
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.03, dt), params)
    a2 = params["block_0"]["attn2"]
    kv = (ctx @ a2["to_k"]["kernel"], ctx @ a2["to_v"]["kernel"])

    def twin(xt):
        return ft.transformer_block_reference(xt, params, HEADS, None, kv)

    def twin_flat(xt):
        b, t, c = xt.shape
        out = ft.transformer_block_reference(
            xt.reshape(1, b * t, c), params, HEADS, None,
            (kv[0].reshape(1, -1, C), kv[1].reshape(1, -1, C)))
        return out.reshape(b, t, c)
    # NOTE: twin_flat mixes attention across the batch — WRONG numerics,
    # useful only to bound the dense-op cost with 2D shapes.

    variants = {"xla_twin_3d": twin, "xla_twin_flat_WRONG": twin_flat}

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
