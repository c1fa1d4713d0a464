"""Device mesh + sharding layer: data parallelism the TPU-native way.

The reference's only distribution strategy is Lightning DDP over NCCL
(main.py:581, SURVEY.md §2.2). Here that becomes: one `jax.sharding.Mesh`
with a `data` axis (spanning ICI within a slice and DCN across slices — JAX
orders devices so the innermost axis rides ICI), batch arrays sharded on
`data`, parameters replicated. `jax.jit` over these shardings emits the
gradient all-reduce (psum) automatically; there is no backend code to write.

A second `model` axis is reserved for tensor-sharding the 512px stage; the
mesh helpers accept an axis spec so larger topologies keep working.

Data loading is host-sharded by `jax.process_index()` (`host_local_slice`),
replacing torch's DistributedSampler.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    axis_shapes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; defaults to all devices on the `data` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_shapes is None:
        axis_shapes = (len(devices), 1)
    arr = np.asarray(devices).reshape(tuple(axis_shapes))
    return Mesh(arr, tuple(axis_names[: arr.ndim]))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across the data axis; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Device-put a host batch pytree with dim-0 sharded on `axis`.

    Single-host: `batch` is the global batch; a plain sharded device_put.
    Multi-host (after `multihost.initialize`): `batch` is this process's
    LOCAL slice (`host_local_slice` of the global batch — what the
    host-sharded loaders yield), and the global array is assembled with
    `jax.make_array_from_process_local_data`, the multi-controller
    replacement for torch's DistributedSampler + DDP input path.
    """
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def host_local_slice(global_batch: int, process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> slice:
    """The slice of the global batch this host should load.

    Replaces DistributedSampler: each host loads global_batch/process_count
    examples; jax.make_array_from_process_local_data assembles the global
    array when running multi-host.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    assert global_batch % pc == 0, (global_batch, pc)
    per = global_batch // pc
    return slice(pi * per, (pi + 1) * per)
