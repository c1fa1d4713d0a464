"""A/B the fused-transformer kernel variants on-chip (round 3).

Variants (flipped via module globals in one process, marginal-cost timed
like micro_block.py so tunnel dispatch latency cancels):

  - exp vs exp2 softmax (log2(e) folded into the q scale)
  - samples-per-program 1 / 2 / 4 (weight-shared matmuls merged across
    samples; scores/softmax stay per sample-head)

Geometries: ds1 (T=768, C=224) and ds2 (T=192, C=448) of interp_256,
batch 32, bf16, cross-KV precomputed — exactly the serving hot path.
"""

import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_geometry(name, B, T, C, HEADS, TK, spps):
    import jax
    import jax.numpy as jnp

    from upgpt_tpu.models.unet import SpatialTransformer
    import upgpt_tpu.ops.fused_transformer as ft

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, C)) * 0.1, dt)
    ctx = jnp.asarray(rng.normal(size=(B, TK, C)), dt)
    mod = SpatialTransformer(C, HEADS, C // HEADS, context_dim=C)
    params = mod.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, T // 8, 8, C)), jnp.zeros((1, TK, C)))["params"]
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.03, dt), params)
    a2 = params["block_0"]["attn2"]
    kv = (ctx @ a2["to_k"]["kernel"], ctx @ a2["to_v"]["kernel"])

    n_short, n_long = 10, 60
    results = {}
    for exp2 in (False, True):
        for spp in spps:
            label = f"{name} spp={spp} {'exp2' if exp2 else 'exp'}"
            ft._SOFTMAX_EXP2 = exp2
            ft._SPP_OVERRIDE = spp

            def chained(xt, n):
                def body(c, _):
                    return ft.fused_transformer_block(
                        c, params, HEADS, None, kv).astype(c.dtype), ()
                out, _ = jax.lax.scan(body, xt, None, length=n)
                return out

            try:
                js = jax.jit(functools.partial(chained, n=n_short))
                jl = jax.jit(functools.partial(chained, n=n_long))
                np.asarray(js(x)); np.asarray(jl(x))
                ts, tl = [], []
                for _ in range(5):
                    t0 = time.perf_counter(); np.asarray(js(x))
                    ts.append(time.perf_counter() - t0)
                    t0 = time.perf_counter(); np.asarray(jl(x))
                    tl.append(time.perf_counter() - t0)
                per = (min(tl) - min(ts)) / (n_long - n_short) * 1000
                results[label] = per
                print(f"{label}: {per:.3f} ms/op marginal", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{label}: FAILED {type(e).__name__}: {str(e)[:140]}",
                      flush=True)
            finally:
                ft._SOFTMAX_EXP2 = True
                ft._SPP_OVERRIDE = None
    return results


def main():
    res = {}
    res.update(bench_geometry("ds1", 32, 768, 224, 8, 87, (1, 2, 4)))
    res.update(bench_geometry("ds2", 32, 192, 448, 8, 87, (1, 2, 4)))
    base1 = res.get("ds1 spp=1 exp")
    best1 = min((v for k, v in res.items() if k.startswith("ds1")),
                default=None)
    if base1 and best1:
        print(f"ds1 best vs baseline: {best1:.3f} vs {base1:.3f} ms "
              f"({(1 - best1 / base1) * 100:.1f}% faster)")


if __name__ == "__main__":
    main()
