"""Tensor-parallel parameter shardings: the optional `model` mesh axis.

The reference distributes only by data parallelism (Lightning DDP,
main.py:581); SURVEY.md §2.2 reserves an optional 2D mesh for the 512px
stage. This module provides that axis the TPU-native way: a PartitionSpec
pytree for the U-Net parameters with the classic column/row (Megatron)
split on every transformer matmul —

    to_q / to_k / to_v / ff.proj_in      (C, k*C) -> P(None, "model")
    to_out / ff.proj_out                 (k*C, C) -> P("model", None)
    SpatialTransformer proj_in           column   -> P(None, "model")
    SpatialTransformer proj_out          row      -> P("model", None)

plus (optionally) output-channel sharding of conv kernels. Everything else
(norms, time embeddings, biases of row-parallel layers) is replicated.

Under `jax.jit` these are layout CONSTRAINTS, not program edits: GSPMD
keeps the logical program identical and inserts the all-gathers /
reduce-scatters implied by the annotations, so a tensor-parallel run is
bitwise-equivalent (up to fp reassociation) to the single-device one —
verified by tests/test_tensor_parallel.py on a virtual mesh. Because the
head count (8) divides the column shards evenly for tp in {2, 4, 8}, the
per-head attention math shards along heads with no cross-shard traffic.

Scope note: the Pallas kernels (flash attention, fused transformer) are
per-device programs and are not sharded by GSPMD; tensor-parallel serving
uses the XLA path (use_fused_transformer/use_flash_attention off). On one
chip the fused kernels win; across chips TP trades them for sharded matmul
FLOPs and weight memory — profile per topology.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COLUMN = ("to_q", "to_k", "to_v")
_ROW = ("to_out",)


def _path_keys(path) -> list:
    return [p.key for p in path if hasattr(p, "key")]


def _spec_for(keys, shape, axis: str, shard_convs: bool):
    """PartitionSpec for one U-Net parameter leaf."""
    leaf = keys[-1]
    parent = keys[-2] if len(keys) >= 2 else ""
    grand = keys[-3] if len(keys) >= 3 else ""
    in_transformer = any(("attn" in k) for k in keys[:-1])

    if in_transformer:
        if parent in _COLUMN and leaf == "kernel":
            return P(None, axis)
        if parent in _ROW:
            # row-parallel: contraction dim sharded, bias replicated
            return P(axis, None) if leaf == "kernel" else P()
        if grand == "ff" or parent in ("proj_in", "proj_out"):
            # ff.proj_in / transformer proj_in are column-parallel;
            # ff.proj_out / transformer proj_out are row-parallel.
            # Known cost: GEGLU splits proj_in's (C, 8C) output into
            # contiguous xh/gate halves (unet.py GEGLUFeedForward), so the
            # column shards do not align with the halves and GSPMD moves a
            # half-FF-width activation per block for the gating multiply; a
            # Megatron-exact layout would interleave the halves per shard,
            # which requires permuting converted checkpoint columns — not
            # worth the converter coupling at current scale.
            if parent == "proj_in":
                return P(None, axis) if leaf == "kernel" else P(axis)
            if parent == "proj_out":
                return P(axis, None) if leaf == "kernel" else P()
        return P()  # norms etc.
    if shard_convs and leaf == "kernel" and len(shape) == 4 and shape[-1] % 8 == 0:
        return P(None, None, None, axis)
    return P()


def unet_param_specs(params: Any, axis: str = "model",
                     shard_convs: bool = False) -> Any:
    """PartitionSpec pytree (same structure as `params`) for the denoiser.

    `params` may be real arrays or `jax.eval_shape` structs; only shapes
    and tree paths are inspected. Non-U-Net subtrees (vae, pose, clip
    towers) come back replicated — shard them separately if needed.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat[0]:
        keys = _path_keys(path)
        if "unet" in keys:
            specs.append(_spec_for(keys, leaf.shape, axis, shard_convs))
        else:
            specs.append(P())
    return jax.tree_util.tree_unflatten(flat[1], specs)


def shard_params(mesh: Mesh, params: Any, axis: str = "model",
                 shard_convs: bool = False) -> Any:
    """device_put `params` with tensor-parallel shardings over `mesh`."""
    specs = unet_param_specs(params, axis=axis, shard_convs=shard_convs)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def validate_divisibility(params: Any, tp: int, axis: str = "model",
                          shard_convs: bool = False,
                          num_heads: Optional[int] = None) -> None:
    """Fail fast when a sharded dim does not divide by the tp degree
    (GSPMD would otherwise fall back to replication silently)."""
    if num_heads is not None and num_heads % tp:
        raise ValueError(f"num_heads {num_heads} not divisible by tp={tp}")
    specs = unet_param_specs(params, axis=axis, shard_convs=shard_convs)
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
    for (path, leaf), spec in zip(flat_p, flat_s):
        for dim, name in enumerate(spec):
            if name == axis and leaf.shape[dim] % tp:
                raise ValueError(
                    f"{jax.tree_util.keystr(path)} dim {dim} "
                    f"({leaf.shape[dim]}) not divisible by tp={tp}")
