"""Multi-host (TPU pod / multi-node) bootstrap and process-0 gating.

The reference scales past one machine with Lightning DDP over torch
distributed (`Trainer(num_nodes=...)`, main.py:581); every node runs the
same script and NCCL stitches them together. The TPU-native equivalent is
JAX's multi-controller runtime: every host runs the same program,
`jax.distributed.initialize` connects them, and afterwards `jax.devices()`
is the GLOBAL device list — the same `Mesh` + `NamedSharding` code written
for one host spans the pod unchanged, with XLA emitting ICI/DCN collectives.

What changes for the program is only the data path (each host feeds its
local slice of the global batch — `mesh.shard_batch` assembles the global
array via `jax.make_array_from_process_local_data`) and that host-side
side effects (checkpoints, metrics, image logging) run on process 0 only.

Verified end-to-end by `tests/test_multihost.py`: two real OS processes,
four virtual CPU devices each, one global mesh — the train step's loss and
updated params match the single-process 8-device run.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
    coordinator_bind_address: Optional[str] = None,
) -> None:
    """Connect this host to the multi-controller runtime (idempotent).

    On TPU pods all arguments are auto-detected from the TPU metadata
    server — call with no arguments on every host (the reference's
    `num_nodes` equivalent). Explicit arguments support CPU/GPU clusters
    and tests. A single-process run with no arguments and no cluster
    environment is a no-op, so `cli train --multihost` is safe everywhere.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    import jax

    explicit = coordinator_address is not None
    # NB: bare presence of TPU_WORKER_HOSTNAMES is NOT a pod signal — some
    # single-chip runtimes set it to "localhost"; only a multi-entry list is
    auto_env = any(
        v in os.environ
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS")
    ) or _on_tpu_pod()
    if not explicit and not auto_env:
        return  # single host, nothing to join
    if (coordinator_bind_address is None and coordinator_address
            and coordinator_address.split(":")[0]
            in ("127.0.0.1", "localhost")):
        # loopback coordinator (tests/single-machine): bind exactly there —
        # the default wildcard [::] bind can land on an interface the
        # workers cannot reach in sandboxed environments
        coordinator_bind_address = coordinator_address
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
        coordinator_bind_address=coordinator_bind_address,
    )
    _INITIALIZED = True


def _on_tpu_pod() -> bool:
    """True when the TPU runtime env describes a multi-worker slice."""
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return "," in hosts


def is_primary() -> bool:
    """True on the host that owns checkpoints / metrics / image logs."""
    import jax

    return jax.process_index() == 0


def barrier(name: str = "upgpt_barrier") -> None:
    """Block until every process reaches this point (no-op single-host).

    Pod-level synchronization primitive for callers that need all hosts
    aligned before a shared-filesystem read (e.g. resuming right after a
    save). The trainer itself does not need it — non-primary hosts never
    touch the checkpoint files during training.
    """
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
