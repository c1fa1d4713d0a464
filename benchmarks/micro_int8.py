"""Probe: does int8 buy MXU throughput on this chip at the U-Net's shapes?

v5e lists 394 TOPS int8 vs 197 TFLOP/s bf16 — IF XLA lowers s8xs8->s32
convs/dots to native int8 MXU passes, a quantized serving mode could halve
the conv/FF-matmul time that dominates the non-attention part of the step
(the attention floor is tile-issue-bound at head_dim 28 and would not
move; docs/PERF.md proof-of-bound). This microbench times the question
before any quantization machinery is built.

Measurement design for a tunnel-attached host (first version measured the
WIRE: fencing a (24576,896) f32 output moves 88 MB through a ~10 MB/s
congested tunnel — 8.9 s of pure d2h for a sub-ms op): each timed unit is
ONE jit call that CHAINS K applications of the op (output feeds the next
input, so XLA cannot CSE or elide them) and fences a SCALAR sum — per-op
time = call_time / K with dispatch+wire amortized to nothing.

- 3x3 conv 224ch and 448ch at the ds1/ds2 trunk spatial dims (chained
  self-maps; int8 chain re-quantizes int32->int8 each hop, the elementwise
  pass is ~0.1% of the conv MACs).
- the transformer FF pair (224->896->224 per hop, T=768 x batch 32 rows),
  the sampling loop's dominant dot.

Prints a table + verdict; ledger row `int8_probe_conv_speedup`.

Run: python benchmarks/micro_int8.py   (TPU; ~3 min)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_CHAIN = 24
N_REPS = 8


def timed(fn, *args):
    """Best-of-N wall time of one jitted K-chain call, scalar-fenced."""
    np.asarray(fn(*args))  # compile + fence
    best = float("inf")
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / K_CHAIN


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, k, ptype):
        return lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=ptype)

    rows = []
    for label, b, h, w, c in [("conv3x3 ds1 224ch", 32, 32, 24, 224),
                              ("conv3x3 ds2 448ch", 32, 16, 12, 448)]:
        x = rng.normal(size=(b, h, w, c))
        k = rng.normal(size=(3, 3, c, c)) * 0.05  # keep the bf16 chain finite

        @jax.jit
        def f_bf16(x, k):
            def body(i, h):
                return conv(h, k, jnp.float32).astype(jnp.bfloat16)

            return jnp.sum(lax.fori_loop(0, K_CHAIN, body, x)
                           .astype(jnp.float32))

        @jax.jit
        def f_int8(x, k):
            def body(i, h):
                y = conv(h, k, jnp.int32)
                # re-quantize: shift+clip back to int8 (the pass a real
                # quantized path would run); >>7 keeps values live
                return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)

            return jnp.sum(lax.fori_loop(0, K_CHAIN, body, x)
                           .astype(jnp.int32))

        t_bf = timed(f_bf16, jnp.asarray(x, jnp.bfloat16),
                     jnp.asarray(k, jnp.bfloat16))
        print(f"  {label} bf16: {t_bf*1e3:.3f} ms/op", file=sys.stderr,
              flush=True)
        t_i8 = timed(f_int8,
                     jnp.asarray(np.clip(x * 8, -127, 127).astype(np.int8)),
                     jnp.asarray(np.clip(k * 160, -127, 127).astype(np.int8)))
        print(f"  {label} int8: {t_i8*1e3:.3f} ms/op", file=sys.stderr,
              flush=True)
        rows.append((label, t_bf, t_i8, 2 * b * h * w * c * c * 9))

    # FF pair: (B*T, 224) -> 896 -> back to 224, chained
    bt, c = 32 * 768, 224
    x = rng.normal(size=(bt, c))
    w_up = rng.normal(size=(c, 4 * c)) * 0.03
    w_dn = rng.normal(size=(4 * c, c)) * 0.03

    @jax.jit
    def d_bf16(x, wu, wd):
        def body(i, h):
            mid = jnp.dot(h, wu, preferred_element_type=jnp.float32)
            return jnp.dot(mid.astype(jnp.bfloat16), wd,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        return jnp.sum(lax.fori_loop(0, K_CHAIN, body, x)
                       .astype(jnp.float32))

    @jax.jit
    def d_int8(x, wu, wd):
        def body(i, h):
            mid = jnp.dot(h, wu, preferred_element_type=jnp.int32)
            mid8 = jnp.clip(mid >> 7, -127, 127).astype(jnp.int8)
            out = jnp.dot(mid8, wd, preferred_element_type=jnp.int32)
            return jnp.clip(out >> 7, -127, 127).astype(jnp.int8)

        return jnp.sum(lax.fori_loop(0, K_CHAIN, body, x)
                       .astype(jnp.int32))

    t_bf = timed(d_bf16, jnp.asarray(x, jnp.bfloat16),
                 jnp.asarray(w_up, jnp.bfloat16),
                 jnp.asarray(w_dn, jnp.bfloat16))
    print(f"  FF pair bf16: {t_bf*1e3:.3f} ms/op", file=sys.stderr, flush=True)
    t_i8 = timed(d_int8,
                 jnp.asarray(np.clip(x * 8, -127, 127).astype(np.int8)),
                 jnp.asarray(np.clip(w_up * 300, -127, 127).astype(np.int8)),
                 jnp.asarray(np.clip(w_dn * 300, -127, 127).astype(np.int8)))
    print(f"  FF pair int8: {t_i8*1e3:.3f} ms/op", file=sys.stderr, flush=True)
    rows.append(("FF pair 24576x(224<->896)", t_bf, t_i8,
                 2 * 2 * bt * c * 4 * c))

    print(f"{'op (per chained hop)':>28s} {'bf16 ms':>9s} {'int8 ms':>9s} "
          f"{'speedup':>8s} {'bf16 TF/s':>10s}")
    speedups = []
    for label, t_bf, t_i8, flop in rows:
        sp = t_bf / t_i8
        speedups.append(sp)
        print(f"{label:>28s} {t_bf*1e3:9.3f} {t_i8*1e3:9.3f} {sp:8.2f}x "
              f"{flop/t_bf/1e12:10.1f}")

    mean_sp = float(np.mean(speedups))
    from _ledger import record

    record("int8_probe_conv_speedup", mean_sp, "x_vs_bf16",
           per_op={r[0]: round(r[1] / r[2], 3) for r in rows},
           k_chain=K_CHAIN)
    verdict = ("int8 pays: build the quantized serving path"
               if mean_sp > 1.4 else
               "int8 does NOT pay at these shapes on this chip/XLA "
               "lowering; negative result, no quantization machinery")
    print("verdict:", verdict)


if __name__ == "__main__":
    main()
