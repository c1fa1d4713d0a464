"""Shared on-chip evidence ledger: every bench script appends its headline
result to benchmarks/results.jsonl (VERDICT r2 item 9) so numbers quoted in
docs/PERF.md stay verifiable after the fact."""

import json
import os
import time


def _clean(v):
    # strict-JSON ledger: non-finite floats (e.g. ms_ssim on geometries too
    # small for 5-scale decomposition) become null, not bare NaN tokens
    import math

    if isinstance(v, float) and not math.isfinite(v):
        return None
    return v


def record(metric: str, value: float, unit: str, **extra) -> None:
    row = {"metric": metric, "value": round(float(value), 3), "unit": unit,
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
           **{k: _clean(v) for k, v in extra.items()}}
    try:
        import jax

        row.setdefault("device", str(jax.devices()[0]))
    except Exception:
        pass
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results.jsonl")
    try:
        with open(path, "a") as f:
            f.write(json.dumps(row) + "\n")
    except OSError:
        pass  # read-only checkout: stdout output is the contract
