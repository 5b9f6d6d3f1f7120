"""Distributed point-cloud ops over a sharded N (point-count) axis.

For clouds too large for one chip's HBM, the N axis shards over a mesh axis
and the sequential ops become collective loops — the point-cloud analog of
sequence parallelism (SURVEY §5 long-context notes). FPS is the interesting
case: every iteration needs a GLOBAL argmax of the running min-distance
vector and a broadcast of the winning point's coordinates, which here are
one `all_gather` of per-shard (max, argmax) pairs (d·B scalars — tiny, rides
ICI) and one `psum` of the masked centroid per iteration. Everything else
stays shard-local, so per-chip work drops N/d-fold while the collective
payload is independent of N.

The reference has no distributed anything (SURVEY §2.8); its FPS is a
per-cloud numpy loop (pointnet2_utils.py:47-68). Numerics here match
ops.farthest_point_sample exactly — contiguous block sharding keeps global
first-index-wins tie-breaking because both the within-shard argmax and the
cross-shard argmax pick the first maximum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_farthest_point_sample(
    points: jax.Array,
    num_samples: int,
    mesh: Mesh,
    *,
    axis: str = "points",
    start_idx: jax.Array | int = 0,
) -> jax.Array:
    """FPS over clouds whose N axis is sharded across ``mesh[axis]``.

    Args:
      points: ``[B, N, C]``; will be placed with N sharded over ``axis``.
      num_samples: S (static).
      mesh: mesh containing ``axis``.
      axis: mesh axis name the point dimension shards over.
      start_idx: ``[B]`` or scalar initial centroid (global index).

    Returns:
      ``[B, S]`` int32 global indices, replicated over the mesh.
    """
    B, N, C = points.shape
    d = mesh.shape[axis]
    if N % d:
        raise ValueError(f"N={N} not divisible by axis size {d}")
    S = int(num_samples)
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (B,))

    def local(pts, start):
        # pts: [B, N/d, C] shard; start replicated [B]
        r = lax.axis_index(axis)
        Nl = pts.shape[1]

        def body(i, carry):
            dist, far, idx_out = carry                      # dist [B, Nl] local
            idx_out = idx_out.at[:, i].set(far)
            # owner shard contributes the centroid; psum broadcasts it
            owner = (far // Nl) == r                        # [B]
            li = jnp.clip(far - r * Nl, 0, Nl - 1)
            cent = jnp.take_along_axis(pts, li[:, None, None], axis=1)  # [B,1,C]
            cent = lax.psum(jnp.where(owner[:, None, None], cent, 0.0), axis)
            dist = jnp.minimum(dist, jnp.sum((pts - cent) ** 2, axis=-1))
            # global argmax: tiny all_gather of per-shard (max, argmax)
            loc_max = jnp.max(dist, axis=1)                 # [B]
            loc_arg = jnp.argmax(dist, axis=1).astype(jnp.int32) + r * Nl
            all_max = lax.all_gather(loc_max, axis)         # [d, B]
            all_arg = lax.all_gather(loc_arg, axis)         # [d, B]
            win = jnp.argmax(all_max, axis=0)               # first max wins
            far = jnp.take_along_axis(all_arg, win[None, :], axis=0)[0]
            return dist, far, idx_out

        dist0 = jnp.full((B, Nl), 1e10, dtype=jnp.float32)
        idx0 = jnp.zeros((B, S), dtype=jnp.int32)
        _, _, idx = lax.fori_loop(0, S, body, (dist0, start, idx0))
        return idx

    fn = jax.shard_map(
        functools.partial(local),
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None)),
        out_specs=P(None),
        check_vma=False,
    )
    points = jax.device_put(points, NamedSharding(mesh, P(None, axis, None)))
    return fn(points.astype(jnp.float32), start)
