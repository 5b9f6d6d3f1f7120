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

Model integration: with ``parallel.context.point_sharding`` active,
``ops.sample_and_group`` and the MSG layer dispatch here instead of leaving
the gathers to GSPMD. ``batch_axis`` lets the same kernels run under a 2-D
(data × points) mesh: batch rows stay shard-local on the data axis while
the point collectives run over the points axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _specs(batch_axis: str | None, axis: str):
    """(batch spec, point spec, replicated-over-points spec) helpers."""
    return (
        P(batch_axis),                       # [B]
        P(batch_axis, axis, None),           # [B, N, C]
        P(batch_axis, None),                 # [B, S]-like, replicated over pts
    )


def _place(mesh: Mesh, arr: jax.Array, spec: P) -> jax.Array:
    return jax.device_put(arr, NamedSharding(mesh, spec))


def sharded_farthest_point_sample(
    points: jax.Array,
    num_samples: int,
    mesh: Mesh,
    *,
    axis: str = "points",
    batch_axis: str | None = None,
    start_idx: jax.Array | int = 0,
) -> jax.Array:
    """FPS over clouds whose N axis is sharded across ``mesh[axis]``.

    Args:
      points: ``[B, N, C]``; will be placed with N sharded over ``axis``.
      num_samples: S (static).
      mesh: mesh containing ``axis``.
      axis: mesh axis name the point dimension shards over.
      batch_axis: optional mesh axis the batch dimension shards over (2-D
        data × points meshes); collectives still run only over ``axis``.
      start_idx: ``[B]`` or scalar initial centroid (global index).

    Returns:
      ``[B, S]`` int32 global indices, replicated over ``axis``.
    """
    B, N, C = points.shape
    d = mesh.shape[axis]
    if N % d:
        raise ValueError(f"N={N} not divisible by axis size {d}")
    S = int(num_samples)
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (B,))

    def local(pts, start):
        # pts: [Bl, N/d, C] shard; start [Bl] replicated over the points axis
        #
        # ONE collective per iteration (round-5, VERDICT r4 #8): the naive
        # loop needs TWO latency-bound hops per FPS step — a psum to
        # broadcast the current centroid's coordinates, then an all_gather
        # of the per-shard (max, argmax) candidates. But the next centroid
        # IS one of the gathered candidates, so piggybacking each shard's
        # candidate COORDINATES onto the same packed all_gather lets every
        # shard pick the winner's coordinates locally — the psum survives
        # only for the caller-supplied start index, outside the loop.
        # 2S collectives -> S+1. Payloads stay tiny ([d, Bl, 2+C] floats),
        # so in the latency-dominated regime this halves ICI time/step.
        r = lax.axis_index(axis)
        Bl, Nl = pts.shape[0], pts.shape[1]

        # initial centroid coordinates: owner-shard psum (once, not per step)
        owner0 = (start // Nl) == r                         # [Bl]
        li0 = jnp.clip(start - r * Nl, 0, Nl - 1)
        cent0 = jnp.take_along_axis(pts, li0[:, None, None], axis=1)[:, 0]
        cent0 = lax.psum(jnp.where(owner0[:, None], cent0, 0.0), axis)  # [Bl,C]

        def body(i, carry):
            dist, far, cent, idx_out = carry    # dist [Bl,Nl]; cent [Bl,C]
            idx_out = idx_out.at[:, i].set(far)
            dist = jnp.minimum(dist, jnp.sum((pts - cent[:, None, :]) ** 2,
                                             axis=-1))
            loc_argl = jnp.argmax(dist, axis=1)             # [Bl] local idx
            loc_max = jnp.take_along_axis(dist, loc_argl[:, None], axis=1)[:, 0]
            loc_arg = loc_argl.astype(jnp.int32) + r * Nl   # global idx
            loc_pt = jnp.take_along_axis(
                pts, loc_argl[:, None, None], axis=1)[:, 0]  # [Bl, C]
            # pack (max, bitcast(arg), coords) -> one [Bl, 2+C] f32 payload
            packed = jnp.concatenate(
                [loc_max[:, None],
                 lax.bitcast_convert_type(loc_arg, jnp.float32)[:, None],
                 loc_pt], axis=1)
            allp = lax.all_gather(packed, axis)             # [d, Bl, 2+C]
            win = jnp.argmax(allp[:, :, 0], axis=0)         # first max wins
            sel = jnp.take_along_axis(
                allp, win[None, :, None], axis=0)[0]        # [Bl, 2+C]
            far = lax.bitcast_convert_type(sel[:, 1], jnp.int32)
            cent = sel[:, 2:]
            return dist, far, cent, idx_out

        dist0 = jnp.full((Bl, Nl), 1e10, dtype=jnp.float32)
        idx0 = jnp.zeros((Bl, S), dtype=jnp.int32)
        _, _, _, idx = lax.fori_loop(0, S, body, (dist0, start, cent0, idx0))
        return idx

    bspec, pspec, rspec = _specs(batch_axis, axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pspec, bspec),
        out_specs=rspec,
        check_vma=False,
    )
    return fn(_place(mesh, points.astype(jnp.float32), pspec), start)


def _local_ball_query(cent, pts, r, Nl, N):
    """Shard-local squared distances + GLOBAL point ids; the caller
    thresholds per radius and merges K-lowest across shards."""
    sentinel = jnp.int32(N)
    d2 = (
        jnp.sum(cent * cent, axis=-1)[..., None]
        - 2.0 * jnp.einsum("bsc,bnc->bsn", cent, pts)
        + jnp.sum(pts * pts, axis=-1)[:, None, :]
    )                                                     # [Bl, S, Nl]
    ids = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 2) + r * Nl
    return d2, ids, sentinel


def _merge_candidates(keys, K, Nl, axis, sentinel):
    neg_topk, _ = lax.top_k(-keys, min(K, Nl))            # K lowest local
    cand = -neg_topk                                      # [Bl, S, K]
    allc = lax.all_gather(cand, axis)                     # [d, Bl, S, K]
    allc = jnp.moveaxis(allc, 0, 2).reshape(*cand.shape[:2], -1)
    neg_topk, _ = lax.top_k(-allc, K)
    idx = -neg_topk                                       # [Bl, S, K] global
    first = idx[..., :1]
    idx = jnp.where(idx == sentinel, first, idx)          # pad-with-first
    # fully-empty ball: clamp the residual sentinel to N-1 so the
    # owner_gather agrees with the XLA/Pallas paths (ops/grouping.py)
    return jnp.minimum(idx, sentinel - 1)


def _owner_gather(arr, idx, r, Nl, axis):
    """Fetch arr[b, idx] for global idx via owner-masked psum."""
    owner = (idx // Nl) == r                              # [Bl, ...]
    li = jnp.clip(idx - r * Nl, 0, Nl - 1)
    flat = li.reshape(li.shape[0], -1)
    g = jnp.take_along_axis(arr, flat[..., None], axis=1)
    g = g.reshape(*idx.shape, arr.shape[-1])
    return lax.psum(jnp.where(owner[..., None], g, 0.0), axis)


def sharded_sample_and_group(
    points: jax.Array,
    features: jax.Array | None,
    num_centroids: int,
    num_neighbors: int,
    radius: float,
    mesh: Mesh,
    *,
    axis: str = "points",
    batch_axis: str | None = None,
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

    Returns:
      ``(centroids [B,S,C], grouped [B,S,K,C(+D)])`` replicated over
      ``axis`` — grouped layout matches ops.sample_and_group ([centered
      coords, features]).
    """
    B, N, C = points.shape
    d = mesh.shape[axis]
    if N % d:
        raise ValueError(f"N={N} not divisible by axis size {d}")
    S, K = int(num_centroids), int(num_neighbors)
    fps_idx = sharded_farthest_point_sample(
        points, S, mesh, axis=axis, batch_axis=batch_axis
    )

    def local(pts, cent_idx, feats=None):
        r = lax.axis_index(axis)
        Nl = pts.shape[1]
        cent = _owner_gather(pts, cent_idx, r, Nl, axis)      # [Bl, S, C]
        d2, ids, sentinel = _local_ball_query(cent, pts, r, Nl, N)
        keys = jnp.where(d2 <= radius * radius, ids, sentinel)
        idx = _merge_candidates(keys, K, Nl, axis, sentinel)
        grouped = _owner_gather(pts, idx, r, Nl, axis) - cent[:, :, None, :]
        if feats is not None:
            grouped = jnp.concatenate(
                [grouped, _owner_gather(feats, idx, r, Nl, axis)], -1
            )
        return cent, grouped

    bspec, pspec, rspec = _specs(batch_axis, axis)
    out_specs = (P(batch_axis, None, None), P(batch_axis, None, None, None))
    points = _place(mesh, points.astype(jnp.float32), pspec)
    if features is None:
        fn = jax.shard_map(
            local, mesh=mesh, in_specs=(pspec, rspec),
            out_specs=out_specs, check_vma=False,
        )
        return fn(points, fps_idx)
    features = _place(mesh, features.astype(jnp.float32), pspec)
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(pspec, rspec, pspec),
        out_specs=out_specs, check_vma=False,
    )
    return fn(points, fps_idx, features.astype(jnp.float32))


def sharded_sample_and_group_multi(
    points: jax.Array,
    features: jax.Array | None,
    num_centroids: int,
    radius_list,
    num_neighbors_list,
    mesh: Mesh,
    *,
    axis: str = "points",
    batch_axis: str | None = None,
):
    """Multi-scale grouping over a sharded N axis: ONE distributed FPS and
    ONE shard-local distance matrix serve every radius scale — the
    distributed analog of the fused MSG kernel (kernels/ball_group.py; the
    reference recomputes distances per scale, pointnet2_utils.py:203-219).

    Returns:
      ``(centroids [B,S,C], [grouped_l [B,S,K_l,D+C]])`` with the MSG
      channel order [features, centered coords] (pointnet2_utils.py:211).
    """
    B, N, C = points.shape
    d = mesh.shape[axis]
    if N % d:
        raise ValueError(f"N={N} not divisible by axis size {d}")
    S = int(num_centroids)
    radii = tuple(float(r) for r in radius_list)
    ks = tuple(int(k) for k in num_neighbors_list)
    fps_idx = sharded_farthest_point_sample(
        points, S, mesh, axis=axis, batch_axis=batch_axis
    )

    def local(pts, cent_idx, feats=None):
        r = lax.axis_index(axis)
        Nl = pts.shape[1]
        cent = _owner_gather(pts, cent_idx, r, Nl, axis)      # [Bl, S, C]
        # distance matrix computed ONCE, re-thresholded per scale
        d2, ids, sentinel = _local_ball_query(cent, pts, r, Nl, N)
        outs = []
        for radius, K in zip(radii, ks):
            keys = jnp.where(d2 <= radius * radius, ids, sentinel)
            idx = _merge_candidates(keys, K, Nl, axis, sentinel)
            grouped = _owner_gather(pts, idx, r, Nl, axis) - cent[:, :, None, :]
            if feats is not None:
                # MSG channel order: [features, centered coords]
                grouped = jnp.concatenate(
                    [_owner_gather(feats, idx, r, Nl, axis), grouped], -1
                )
            outs.append(grouped)
        return cent, tuple(outs)

    bspec, pspec, rspec = _specs(batch_axis, axis)
    out_specs = (
        P(batch_axis, None, None),
        tuple(P(batch_axis, None, None, None) for _ in ks),
    )
    points = _place(mesh, points.astype(jnp.float32), pspec)
    if features is None:
        fn = jax.shard_map(
            local, mesh=mesh, in_specs=(pspec, rspec),
            out_specs=out_specs, check_vma=False,
        )
        cent, outs = fn(points, fps_idx)
    else:
        features = _place(mesh, features.astype(jnp.float32), pspec)
        fn = jax.shard_map(
            local, mesh=mesh, in_specs=(pspec, rspec, pspec),
            out_specs=out_specs, check_vma=False,
        )
        cent, outs = fn(points, fps_idx, features)
    return cent, list(outs)
