"""Persistent XLA compilation cache (serving cold-start killer on
direct-attached hosts; default-OFF on the tunneled axon backend).

The flagship sampling program takes 60-700 s to compile on the TPU backend
(tunnel-congestion dependent); with the persistent cache a fresh process
reloads the compiled executable instead of recompiling. The cache is
content-addressed (HLO + compile options + backend version), so stale
entries are never wrongly reused; Pallas/Mosaic custom calls cache fine
(the kernel IR is part of the key).

Backend caveat, measured round 4 (2026-08-20, controlled A/B in fresh
processes): on the TUNNELED axon backend a cache HIT is a ~100x LOSS —
194-258 s to deserialize+load a 252 KB executable whose cold compile+run
is 1.97 s (the deserialize_executable RPC round-trips the tunnel; the
server's own compile path is fast and server-side cached). The cache is
therefore skipped when `jax.default_backend() == "axon"` unless
UPGPT_COMPILE_CACHE=1 forces it; UPGPT_COMPILE_CACHE=0 disables it
everywhere. Round 3's "196 s -> 30.3 s warm" reading did not reproduce
and is re-attributed to the server-side compile cache.

Every entry point (cli, app, bench) calls `enable_persistent_cache()`
before first compile. Respects an explicit JAX_COMPILATION_CACHE_DIR; the
default lives under ~/.cache/upgpt_tpu/xla.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

_DEFAULT_DIR = "~/.cache/upgpt_tpu/xla"


def enable_persistent_cache(cache_dir: Optional[str] = None) -> str:
    """Point JAX's persistent compilation cache at `cache_dir`.

    Call before the first jit execution (import-time of the entry point is
    fine — the config only takes effect at compile time). Returns the
    directory used. A JAX_COMPILATION_CACHE_DIR env var wins over the
    built-in default so deployments can relocate the cache without code.
    """
    import jax

    force = os.environ.get("UPGPT_COMPILE_CACHE")
    if force == "0":
        return ""
    # an explicit opt-in — a caller-passed dir or JAX_COMPILATION_CACHE_DIR —
    # forces the cache on, like the docstring promises; only the implicit
    # default is subject to the axon skip below
    explicit = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if force != "1" and not explicit and jax.default_backend() == "axon":
        # Measured 2026-08-20 (round 4): on the tunneled axon backend a
        # cache HIT costs 194-258 s for a 252 KB executable whose cold
        # compile+run is 1.97 s — the deserialize_executable RPC is ~100x
        # the compile. The same cache on a direct-attached TPU host
        # deserializes locally and wins; default OFF here only.
        # (Round 3's 196->30 s "warm" reading did not reproduce and was
        # most likely the SERVER's own compile cache, which needs no local
        # cache to kick in.)
        return ""
    chosen = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
              or _DEFAULT_DIR)
    path = Path(chosen).expanduser()
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    # default threshold (1 s) already admits every program that matters
    # here, but pin a low floor so DDIM-step-sized programs cache too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    return str(path)
