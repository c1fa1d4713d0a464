"""Microbenchmark: flash-attention kernel variants at the UPGPT geometries.

Times each variant as a 20-deep chained scan inside one jit (amortizes the
axon tunnel's multi-ms dispatch latency), fenced by a host transfer.

Usage: python benchmarks/micro_attention.py [b h t d]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from upgpt_tpu.ops.flash_attention import (
        _flash_forward, _flash_forward_headloop, _reference_attention,
    )

    b, h, t, d = (
        [int(a) for a in sys.argv[1:5]] if len(sys.argv) > 4 else (32, 8, 768, 28)
    )
    reps = 20
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), dt)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), dt)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), dt)

    variants = {
        "xla_einsum": lambda q_, k_, v_: _reference_attention(q_, k_, v_),
        "grid_bh_bq384": lambda q_, k_, v_: _flash_forward(q_, k_, v_, 384),
        "grid_bh_bqT": lambda q_, k_, v_: _flash_forward(q_, k_, v_, t),
        "headloop_bqT": lambda q_, k_, v_: _flash_forward_headloop(q_, k_, v_, t),
        "headloop_bq384": lambda q_, k_, v_: _flash_forward_headloop(q_, k_, v_, 384),
    }
    if t % 384:
        variants.pop("grid_bh_bq384")
        variants.pop("headloop_bq384")
        variants["grid_bh_bq256"] = lambda q_, k_, v_: _flash_forward(q_, k_, v_, 256)
        variants["headloop_bq256"] = lambda q_, k_, v_: _flash_forward_headloop(q_, k_, v_, 256)

    # the tunnel's dispatch latency is 100s of ms and swamps a single call;
    # measure the MARGINAL per-op cost as (t_long - t_short) / (n_long - n_short)
    n_short, n_long = 20, 120
    ref = None
    for name, fn in variants.items():
        def chained(q_, k_, v_, n, fn=fn):
            def body(c, _):
                out = fn(c, k_, v_)
                # feed back (same shape) so the scan can't be collapsed
                return out.astype(c.dtype), ()
            out, _ = jax.lax.scan(body, q_, None, length=n)
            return out

        js = jax.jit(lambda a, b, c_, fn=fn: chained(a, b, c_, n_short, fn))
        jl = jax.jit(lambda a, b, c_, fn=fn: chained(a, b, c_, n_long, fn))
        try:
            out = np.asarray(js(q, k, v))  # compile + correctness fence
            np.asarray(jl(q, k, v))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        if ref is None:
            ref = out
        else:
            err = np.abs(out.astype(np.float32) - ref.astype(np.float32)).max()
            print(f"  ({name} vs ref max err {err:.4g})")
        ts, tl = [], []
        for _ in range(6):
            t0 = time.perf_counter()
            np.asarray(js(q, k, v))
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(jl(q, k, v))
            tl.append(time.perf_counter() - t0)
        per_op = (min(tl) - min(ts)) / (n_long - n_short) * 1000
        print(f"{name}: {per_op:.3f} ms/op marginal "
              f"(short {min(ts)*1e3:.0f} ms, long {min(tl)*1e3:.0f} ms)")


if __name__ == "__main__":
    main()
