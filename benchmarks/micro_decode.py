"""Microbench: PIL vs native (C++/libjpeg, GIL-free) JPEG decode.

Measures the host input pipeline's decode primitive three ways — PIL
serial, PIL on a thread pool, native on a thread pool — over DeepFashion
geometry JPEGs (256x192 targets + 224x224 style crops). The native call
releases the GIL for the whole decode, so the thread-pool numbers scale
with real cores; on a 1-CPU sandbox the expected gain is only the
per-call constant (no PIL object layer), and the row records cpu_count
so readers can judge the scaling headroom.

Appends a row to benchmarks/results.jsonl.
"""

import io
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from upgpt_tpu import native  # noqa: E402
from benchmarks._ledger import record  # noqa: E402


def make_corpus(n=64):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        shape = (256, 192, 3) if i % 2 else (224, 224, 3)
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, shape, np.uint8)).save(
            buf, "JPEG", quality=88)
        out.append(buf.getvalue())
    return out


def pil_decode(data):
    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def run(fn, corpus, workers, n_items=512):
    jobs = [corpus[i % len(corpus)] for i in range(n_items)]
    if workers == 1:
        t0 = time.perf_counter()
        for d in jobs:
            fn(d)
        return n_items / (time.perf_counter() - t0)
    with ThreadPoolExecutor(workers) as ex:
        t0 = time.perf_counter()
        for _ in ex.map(fn, jobs):
            pass
        return n_items / (time.perf_counter() - t0)


def main():
    if not native.available():
        print(json.dumps({"error": "native decoder unavailable"}))
        return
    corpus = make_corpus()
    workers = min(16, (os.cpu_count() or 1) * 2)
    rows = {
        "pil_serial": run(pil_decode, corpus, 1),
        "pil_threads": run(pil_decode, corpus, workers),
        "native_serial": run(native.decode_jpeg, corpus, 1),
        "native_threads": run(native.decode_jpeg, corpus, workers),
    }
    extra = {"workers": workers, "cpu_count": os.cpu_count(),
             **{k: round(v, 1) for k, v in rows.items()}}
    print(json.dumps({"metric": "host_jpeg_decode_items_per_sec",
                      "value": round(rows["native_threads"], 1),
                      "unit": "items/s", **extra}))
    record("host_jpeg_decode_items_per_sec", rows["native_threads"],
           "items/s", **extra)


if __name__ == "__main__":
    main()
