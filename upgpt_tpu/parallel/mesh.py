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


def create_hybrid_mesh(
    n_slices: int,
    chips_per_slice: int,
    axis_names: Sequence[str] = ("slice", "chip"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Two-axis (slice, chip) mesh for multi-slice pods: `chip` rides ICI
    within a slice, `slice` rides DCN across slices (SURVEY §2.2's
    TPU-equivalent of the reference's num_nodes NCCL topology).

    Data parallelism spans BOTH axes (`P(("slice", "chip"))` on the batch
    dim): jit then emits a hierarchical gradient all-reduce — reduce-scatter
    /all-gather over ICI inside each slice plus one slice-count-sized
    exchange over DCN — instead of a flat ring over the slow links, because
    the inner mesh axis holds the ICI-adjacent devices.

    Real multi-slice backends report `device.slice_index`; devices are
    grouped by it so rows of the mesh are genuine slices. Virtual platforms
    (CPU `xla_force_host_platform_device_count`, used by the dryrun) expose
    no slice_index and fall back to id order — same mesh shape, same
    collectives, which is exactly what the dryrun validates.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = n_slices * chips_per_slice
    if len(devices) < n:
        raise ValueError(f"need {n} devices for a {n_slices}x"
                         f"{chips_per_slice} hybrid mesh, got {len(devices)}")
    devices = sorted(devices[:n],
                     key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id))
    arr = np.asarray(devices).reshape(n_slices, chips_per_slice)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Shard dim 0 (batch) across the data axis (or axes — a hybrid mesh
    passes ("slice", "chip") so DP spans ICI and DCN); rest replicated."""
    if axis is None:
        axis = "data" if "data" in mesh.axis_names else tuple(mesh.axis_names)
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis=None) -> Any:
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
