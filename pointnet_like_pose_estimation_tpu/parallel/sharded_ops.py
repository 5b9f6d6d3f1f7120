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


def sharded_sample_and_group(
    points: jax.Array,
    features: jax.Array | None,
    num_centroids: int,
    num_neighbors: int,
    radius: float,
    mesh: Mesh,
    *,
    axis: str = "points",
) -> tuple[jax.Array, jax.Array]:
    """The FULL sample_and_group over a sharded N axis: distributed FPS →
    centroid broadcast → shard-local ball query → global K-lowest merge →
    owner-shard gathers.

    Index-exact vs the single-device path (ops.sample_and_group with the XLA
    impl): contiguous block sharding preserves the reference's
    lowest-global-index-first selection (pointnet2_utils.py:85-89) because
    each shard's K lowest LOCAL indices are a superset of its contribution to
    the K lowest GLOBAL indices, and the cross-shard merge re-selects the K
    smallest. Per-chip distance work drops N/d-fold; collectives are one
    [B,S,C] centroid psum, one [d,B,S,K] index all-gather, and one [B,S,K,C]
    neighborhood psum — all O(S·K), independent of N.

    Args:
      points: ``[B, N, C]`` (placed with N sharded over ``axis``).
      features: optional ``[B, N, D]`` per-point features (same sharding).
      num_centroids: S.
      num_neighbors: K.
      radius: ball radius.
      mesh: mesh containing ``axis``.

    Returns:
      ``(centroids [B,S,C], grouped [B,S,K,C(+D)])`` replicated over the
      mesh — grouped layout matches ops.sample_and_group ([centered coords,
      features]).
    """
    B, N, C = points.shape
    d = mesh.shape[axis]
    if N % d:
        raise ValueError(f"N={N} not divisible by axis size {d}")
    S, K = int(num_centroids), int(num_neighbors)
    fps_idx = sharded_farthest_point_sample(points, S, mesh, axis=axis)

    def local(pts, cent_idx, feats=None):
        r = lax.axis_index(axis)
        Nl = pts.shape[1]
        sentinel = jnp.int32(N)

        def owner_gather(arr, idx):
            """Fetch arr[b, idx] for global idx via owner-masked psum."""
            owner = (idx // Nl) == r                          # [B, ...]
            li = jnp.clip(idx - r * Nl, 0, Nl - 1)
            flat = li.reshape(B, -1)
            g = jnp.take_along_axis(arr, flat[..., None], axis=1)
            g = g.reshape(*idx.shape, arr.shape[-1])
            return lax.psum(jnp.where(owner[..., None], g, 0.0), axis)

        cent = owner_gather(pts, cent_idx)                    # [B, S, C]

        # shard-local ball query: K lowest local in-ball indices (global ids)
        d2 = (
            jnp.sum(cent * cent, axis=-1)[..., None]
            - 2.0 * jnp.einsum("bsc,bnc->bsn", cent, pts)
            + jnp.sum(pts * pts, axis=-1)[:, None, :]
        )                                                     # [B, S, Nl]
        ids = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2) + r * Nl
        keys = jnp.where(d2 <= radius * radius, ids, sentinel)
        neg_topk, _ = lax.top_k(-keys, min(K, Nl))            # K lowest local
        cand = -neg_topk                                      # [B, S, K]
        # merge across shards: K lowest of the d*K candidates
        allc = lax.all_gather(cand, axis)                     # [d, B, S, K]
        allc = jnp.moveaxis(allc, 0, 2).reshape(B, S, -1)
        neg_topk, _ = lax.top_k(-allc, K)
        idx = -neg_topk                                       # [B, S, K] global
        first = idx[..., :1]
        idx = jnp.where(idx == sentinel, first, idx)          # pad-with-first
        # fully-empty ball: clamp the residual sentinel to N-1 so the
        # owner_gather agrees with the XLA/Pallas paths (ops/grouping.py)
        idx = jnp.minimum(idx, sentinel - 1)

        grouped = owner_gather(pts, idx) - cent[:, :, None, :]
        if feats is not None:
            grouped = jnp.concatenate([grouped, owner_gather(feats, idx)], -1)
        return cent, grouped

    pspec = P(None, axis, None)
    points = jax.device_put(points, NamedSharding(mesh, pspec))
    if features is None:
        fn = jax.shard_map(
            local, mesh=mesh, in_specs=(pspec, P(None)),
            out_specs=(P(None), P(None)), check_vma=False,
        )
        return fn(points.astype(jnp.float32), fps_idx)
    features = jax.device_put(features, NamedSharding(mesh, pspec))
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(pspec, P(None), pspec),
        out_specs=(P(None), P(None)), check_vma=False,
    )
    return fn(points.astype(jnp.float32), fps_idx, features.astype(jnp.float32))
