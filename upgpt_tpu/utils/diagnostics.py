"""Tracing, profiling, memory stats, NaN guards (SURVEY.md §5 aux systems).

The reference's observability is minimal (Lightning profiler summary +
commented-out CUDACallback, main.py:453-473,818). TPU-native replacements:

- `profile_trace`: context manager around jax.profiler.trace -> a
  TensorBoard-readable trace of device execution per phase.
- `PhaseTimer`: wall-clock phase accounting (data / step / eval / ckpt),
  the CUDACallback epoch-time equivalent.
- `device_memory_stats`: per-device HBM usage.
- `nan_guard`: jit-compatible finite-check (the reference's
  `assert not torch.isnan(...)` ddpm.py:177, plus train-time loss guards)
  via equinox-style error or host callback print.
- `count_params`: the reference's count_params (ldm/util.py) equivalent.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def profile_trace(logdir: str, with_host: bool = False):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for d in jax.devices():
        stats = d.memory_stats() or {}
        out[str(d)] = {
            "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 1e6,
            "peak_bytes_mb": stats.get("peak_bytes_in_use", 0) / 1e6,
            "bytes_limit_mb": stats.get("bytes_limit", 0) / 1e6,
        }
    return out


class PhaseTimer:
    """Accumulating wall-clock phase timer; .summary() like a profiler dump."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = ["phase                 total_s    calls   mean_ms"]
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<20} {tot:8.2f} {n:8d} {tot / n * 1e3:9.2f}")
        return "\n".join(lines)


def nan_guard(tree: Any, name: str = "tree") -> jax.Array:
    """Returns a bool scalar (all finite). Inside jit, combine with
    jax.lax.cond / checkify; outside, raises on NaN/Inf."""
    leaves = jax.tree.leaves(tree)
    finite = jnp.asarray(True)
    for leaf in leaves:
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            finite = jnp.logical_and(finite, jnp.isfinite(leaf).all())
    if not isinstance(finite, jax.core.Tracer):
        if not bool(finite):
            raise FloatingPointError(f"non-finite values in {name}")
    return finite


def count_params(tree: Any, verbose: bool = False) -> int:
    n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
    if verbose:
        print(f"{n * 1e-6:.2f} M parameters")
    return n


def cast_floating(tree: Any, dtype) -> Any:
    """Cast floating leaves of a param pytree (e.g. fp32 -> bf16 for serving).

    Halves HBM weight traffic per step; integer/bool leaves untouched.
    """
    def _cast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(_cast, tree)
