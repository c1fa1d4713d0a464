"""Production serving engine: request batching over the jitted sampler.

The reference has no serving layer — its app (app.py:262-278) runs one
Streamlit request at a time through a 200-step sampler. On TPU the economics
invert: the sampler is ONE compiled XLA program whose throughput comes from
batch occupancy (27.7 img/s at batch 32 vs ~0.8 img/s at batch 1 on v5e,
docs/PERF.md), so a serving layer must pack concurrent requests into full
static-shape batches. This engine productizes the pattern bench.py measures:

- requests (conditioning embeddings + mask) enter a queue and are packed
  into fixed-size batches — a batching window (`max_delay_s`) trades tail
  latency for occupancy, and the tail batch is padded to the static batch
  shape so ONE compiled program serves every composition (no recompiles,
  no dynamic shapes);
- up to `max_in_flight` batches stay dispatched-but-unfenced (default 2):
  batch i+1 is dispatched (JAX async dispatch) before batch i's
  device->host transfer is fenced, so the device never idles between
  batches, and at depth>=2 the host's pack+dispatch of the NEXT batch is
  also hidden — the regime that matters for ~10-step samplers, where
  dispatch is comparable to device time (docs/PERF.md round 4);
- per-request futures deliver sliced results; a failed batch fails only
  its own requests and the engine keeps serving.

Determinism: each batch's RNG key is fold_in(base_key, batch_counter), so a
result is reproducible given (base_key, batch composition and order). True
per-request noise isolation is not a goal here — the eval protocol's
stochastic eta=1.0 draws are batch-shaped by design (ddim.py).
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np


@dataclass
class ServingStats:
    requests: int = 0
    images: int = 0          # includes padding
    batches: int = 0
    padded_slots: int = 0
    # bounded window: a long-running server must not grow without limit
    latencies_s: deque = field(default_factory=lambda: deque(maxlen=10000))

    def summary(self) -> Dict[str, float]:
        lat = sorted(self.latencies_s)
        pick = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))] if lat else 0.0
        occ = (self.requests / self.images) if self.images else 0.0
        return {
            "requests": self.requests,
            "batches": self.batches,
            "occupancy": round(occ, 4),
            "p50_latency_s": round(pick(0.50), 4),
            "p95_latency_s": round(pick(0.95), 4),
        }


class ServingEngine:
    """Batch-packing serving loop around a GenerationPipeline.

    >>> eng = ServingEngine(pipe, params, batch_size=32)
    >>> eng.start()
    >>> fut = eng.submit({"text_emb": ..., "style_emb": ..., "smpl": ...,
    ...                   "person_mask": ...})
    >>> image = fut.result()          # (H, W, C) numpy
    >>> eng.stop()
    """

    def __init__(
        self,
        pipeline,
        params,
        batch_size: int = 32,
        max_delay_s: float = 0.25,
        base_seed: int = 0,
        mesh=None,
        max_in_flight: int = 2,
    ):
        """`mesh`: optional jax.sharding.Mesh for data-parallel serving —
        each packed batch is sharded over the mesh's `data` axis and the
        params are replicated once, so jit scales the SAME compiled
        program over every chip (batch_size must divide by the data-axis
        size). One-chip serving passes mesh=None and is unchanged.

        `max_in_flight`: dispatched-but-unfenced batch depth. 1 overlaps
        only d2h with compute; 2 (default) also overlaps the HOST's
        pack+dispatch of the next batch, which dominates at low step
        counts (UniPC-10 is dispatch-bound at depth 1 — docs/PERF.md
        round 4). Higher depths add queueing latency without throughput
        beyond the point where the device is saturated."""
        self.pipeline = pipeline
        self.params = params
        self.batch_size = int(batch_size)
        self.max_delay_s = float(max_delay_s)
        self.base_seed = int(base_seed)
        self.mesh = mesh
        self.max_in_flight = max(1, int(max_in_flight))
        if mesh is not None:
            import jax

            from upgpt_tpu.parallel.mesh import replicated_sharding

            n_data = mesh.shape["data"]
            if self.batch_size % n_data:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the mesh "
                    f"data axis ({n_data})")
            self.params = jax.device_put(params, replicated_sharding(mesh))
        self.stats = ServingStats()
        self._queue: "queue.Queue" = queue.Queue()
        self._pushback = None  # group that didn't fit the batch being packed
        self._thread: Optional[threading.Thread] = None
        self._stopping = threading.Event()

    # ------------------------------------------------------------- client

    def submit(self, cond: Dict[str, Any]) -> Future:
        """Enqueue one request; returns a Future of the (H, W, C) image.

        `cond` carries per-sample conditioning WITHOUT the batch dim:
        text_emb (77, 768), optional style_emb (9, 768), smpl (1, 85),
        person_mask (h, w, 1). Shapes must match the engine's model variant
        — every request in a batch shares the compiled program.
        """
        return self.submit_group([cond])[0]

    def submit_group(self, conds: List[Dict[str, Any]]) -> List[Future]:
        """Enqueue a group that is guaranteed to be served in ONE batch.

        Needed wherever samples must share batch-level randomness — e.g.
        interpolation sweeps whose frames carry equal `x_T_seed`s: equal
        seeds only yield equal initial noise within one packed batch
        (pipeline x_T is keyed by fold_in(batch_key, seed)).
        """
        if self._thread is None:
            raise RuntimeError("engine not started")
        if not conds:
            return []
        if len(conds) > self.batch_size:
            raise ValueError(
                f"group of {len(conds)} exceeds batch_size {self.batch_size}")
        futs: List[Future] = [Future() for _ in conds]
        self._queue.put((list(conds), futs, time.perf_counter()))
        return futs

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stopping.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        """Drain the queue, serve what remains, and join the loop."""
        if self._thread is None:
            return
        self._stopping.set()
        self._queue.put(None)  # wake the dispatcher
        self._thread.join()
        self._thread = None

    # ---------------------------------------------------------- dispatcher

    def _collect(self, wait: bool) -> List:
        """One batch worth of request groups; [] when none are available.

        `wait=False` (a batch is in flight): return immediately on an empty
        queue so the caller can fence the in-flight batch instead of
        blocking — otherwise a lone request's future would hang until the
        NEXT request arrived. `wait=True`: block for the first request, then
        fill up to batch_size within the batching window. Groups are atomic:
        one that doesn't fit the remaining space is held in `_pushback` and
        leads the next batch. The shutdown sentinel (None) stops collection;
        a collected tail is still served.
        """
        items: List = []
        count = 0

        def take(item) -> bool:
            nonlocal count
            if count + len(item[0]) > self.batch_size:
                self._pushback = item
                return False
            items.append(item)
            count += len(item[0])
            return True

        if self._pushback is not None:
            item, self._pushback = self._pushback, None
            take(item)  # always fits: group <= batch_size, batch empty
        if not items:
            try:
                if wait and not self._stopping.is_set():
                    first = self._queue.get()
                else:
                    first = self._queue.get_nowait()
            except queue.Empty:
                return items
            if first is not None:
                take(first)
        deadline = time.perf_counter() + self.max_delay_s
        while count < self.batch_size:
            remaining = deadline - time.perf_counter()
            if self._stopping.is_set():
                # no window at shutdown: just drain whatever is queued
                remaining = 0.0
            try:
                nxt = self._queue.get(timeout=max(remaining, 0.0))
            except queue.Empty:
                break
            if nxt is None:
                break
            if not take(nxt):  # held in _pushback for the next batch
                break
        return items

    def _pack(self, items: List) -> Dict[str, Any]:
        """Pad request conditionings to the static batch shape."""
        conds = [c for it in items for c in it[0]]
        n_pad = self.batch_size - len(conds)
        keys = conds[0].keys()
        batch = {}
        for k in keys:
            rows = [np.asarray(c[k]) for c in conds]
            rows += [rows[-1]] * n_pad  # padded slots recompute the last row
            batch[k] = np.stack(rows)
        return batch

    def _run(self) -> None:
        import jax

        base_key = jax.random.PRNGKey(self.base_seed)
        inflight: deque = deque()  # (device_out, items, t_dispatch), oldest first

        def fence(entry):
            out, items, _ = entry
            t_done = time.perf_counter()
            try:
                host = np.asarray(out)
            except Exception as exc:  # noqa: BLE001 — fail that batch only
                for _, futs, _ in items:
                    for fut in futs:
                        fut.set_exception(exc)
                return
            i = 0
            for _, futs, t_in in items:
                for fut in futs:
                    self.stats.latencies_s.append(t_done - t_in)
                    fut.set_result(host[i])
                    i += 1

        while True:
            items = self._collect(wait=not inflight)
            if not items:
                if inflight:
                    fence(inflight.popleft())
                if (not inflight and self._stopping.is_set()
                        and self._queue.empty() and self._pushback is None):
                    return
                continue
            n_samples = sum(len(futs) for _, futs, _ in items)
            try:
                batch = self._pack(items)
                if self.mesh is not None:
                    from upgpt_tpu.parallel.mesh import shard_batch

                    batch = shard_batch(self.mesh, batch)
                key = jax.random.fold_in(base_key, self.stats.batches)
                out = self.pipeline.generate(self.params, batch, key)
            except Exception as exc:  # noqa: BLE001 — shape/tracing errors
                for _, futs, _ in items:
                    for fut in futs:
                        fut.set_exception(exc)
                continue
            self.stats.batches += 1
            self.stats.requests += n_samples
            self.stats.images += self.batch_size
            self.stats.padded_slots += self.batch_size - n_samples
            # overlap: later batches' dispatch AND compute run during the
            # oldest batch's d2h; depth>1 keeps a program queued on-device
            # across the host's pack+dispatch window (docs/PERF.md round 4)
            inflight.append((out, items, time.perf_counter()))
            while len(inflight) >= self.max_in_flight + 1:
                fence(inflight.popleft())
