"""Device mesh and sharding helpers.

Design (SURVEY §2.8 "TPU-native equivalents"): a 1-D ``('data',)`` mesh
shards the cloud batch; XLA emits the gradient all-reduce over ICI
automatically under jit when params are replicated and the batch is sharded.
A second ``'points'`` axis can shard the N (point-count) dimension of large
clouds for the forward/grouping path — the sequence-parallel analog for
point clouds (SURVEY §5 long-context notes). Multi-host extends the same
meshes over DCN via ``jax.distributed.initialize`` without touching the
step functions.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict[str, int] | None = None, *, devices=None) -> Mesh:
    """Build a mesh; default: all devices on one ``data`` axis."""
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes)
    shape = tuple(axis_sizes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, names)


def batch_sharding(mesh: Mesh, *, points_axis: bool = False) -> NamedSharding:
    """Sharding for a [B, N, ...] cloud batch: B over 'data' (and optionally
    N over 'points')."""
    if points_axis and "points" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "points"))
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with B sharded over the 'data' axis."""
    sh = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/state) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)
