"""Shared on-chip evidence ledger: every bench script appends its headline
result to benchmarks/results.jsonl (VERDICT r2 item 9) so numbers quoted in
docs/PERF.md stay verifiable after the fact."""

import json
import os
import time


def _clean(v):
    # strict-JSON ledger: non-finite floats (e.g. ms_ssim on geometries too
    # small for 5-scale decomposition) become null, not bare NaN tokens —
    # recursively, so floats nested in dict/list extras (rho_sweep rows,
    # micro_int8 per_op) can't serialize as bare NaN either
    import math

    if isinstance(v, float) and not math.isfinite(v):
        return None
    if isinstance(v, dict):
        return {k: _clean(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_clean(x) for x in v]
    return v


def record(metric: str, value: float, unit: str, **extra) -> None:
    row = {"metric": metric, "value": _clean(round(float(value), 3)),
           "unit": unit, "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
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
