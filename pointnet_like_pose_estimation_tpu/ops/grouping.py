"""Ball-query neighborhood grouping.

The reference (pointnet2_utils.py:70-90) builds the full ``[B, S, N]``
distance matrix, overwrites out-of-ball entries with a sentinel N, **sorts**
each row and takes the first K — i.e. the K *lowest-index* in-ball points,
padding empty slots with the first in-ball index. We reproduce exactly that
selection without a full sort: ``top_k`` over negated masked indices, which
XLA lowers to a fused partial reduction. The distance matrix itself is the
memory hot spot; the fused Pallas kernel in
``pointnet_like_pose_estimation_tpu.kernels`` tiles it through VMEM instead
of materializing it in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointnet_like_pose_estimation_tpu.ops.geometry import (
    index_points,
    square_distance,
)
from pointnet_like_pose_estimation_tpu.ops.sampling import farthest_point_sample


def _grouping_impl(
    batch: int | None = None,
    num_points: int | None = None,
    num_centroids: int | None = None,
    num_neighbors: int | None = None,
    multi_scale: bool = False,
) -> str:
    from pointnet_like_pose_estimation_tpu.kernels import flags

    return flags.grouping_impl(
        batch, num_points, num_centroids, num_neighbors, multi_scale=multi_scale
    )


def query_ball_point(
    radius: float,
    num_neighbors: int,
    points: jax.Array,
    centroids: jax.Array,
) -> jax.Array:
    """Indices of up to K in-ball points per centroid (lowest-index-first).

    Exact semantics of pointnet2_utils.py:70-90 including the
    pad-with-first-in-ball rule for balls with fewer than K members. The
    query point itself is always within its own ball, so the first slot is
    always valid whenever centroids come from the cloud.

    Args:
      radius: ball radius.
      num_neighbors: K, neighbors per ball (static).
      points: ``[B, N, C]`` all points.
      centroids: ``[B, S, C]`` query points.

    Returns:
      ``[B, S, K]`` int32 indices into the N axis.
    """
    B, N, _ = points.shape
    impl = _grouping_impl(B, N, centroids.shape[1], num_neighbors)
    if impl.startswith("pallas") and centroids.shape[1] % 8 == 0:
        from pointnet_like_pose_estimation_tpu.kernels.ball_group import (
            ball_query_pallas,
        )

        # indices are non-differentiable; stop_gradient keeps autodiff from
        # tracing into the pallas_call (which has no JVP rule)
        return ball_query_pallas(
            jax.lax.stop_gradient(points),
            jax.lax.stop_gradient(centroids),
            radius,
            num_neighbors,
            interpret=impl == "pallas_interpret",
        )
    sqrdists = square_distance(centroids, points)             # [B, S, N]
    in_ball = sqrdists <= radius * radius
    point_ids = jax.lax.broadcasted_iota(jnp.int32, sqrdists.shape, 2)
    # Out-of-ball -> sentinel N; K smallest keys == reference's sort()[:K].
    keys = jnp.where(in_ball, point_ids, N)
    neg_topk, _ = jax.lax.top_k(-keys, num_neighbors)         # [B, S, K]
    idx = -neg_topk
    first = idx[..., :1]
    # a fully-empty ball would pad with the sentinel N itself (the reference
    # would crash on the subsequent gather); clamp to N-1 so every impl —
    # XLA, Pallas, sharded owner_gather — agrees on the degenerate case
    return jnp.minimum(jnp.where(idx == N, first, idx), N - 1)


def query_ball_point_chunked(
    radius: float,
    num_neighbors: int,
    points: jax.Array,
    centroids: jax.Array,
    *,
    tile: int = 64,
) -> jax.Array:
    """query_ball_point with the centroid axis tiled through ``lax.map``.

    Identical results; the [B, S, N] distance matrix never materializes in
    HBM — each map iteration computes a [B, tile, N] slab that XLA keeps
    fused with its top_k. Use for large S*N (e.g. S=512, N>=4096 clouds or
    big batches) where the full matrix would be HBM-resident.
    """
    B, S, C = centroids.shape
    if S % tile != 0:
        return query_ball_point(radius, num_neighbors, points, centroids)
    tiles = jnp.moveaxis(centroids.reshape(B, S // tile, tile, C), 1, 0)

    def one(tile_centroids):
        return query_ball_point(radius, num_neighbors, points, tile_centroids)

    out = jax.lax.map(one, tiles)                             # [S/tile, B, tile, K]
    return jnp.moveaxis(out, 0, 1).reshape(B, S, num_neighbors)


def sample_and_group(
    points: jax.Array,
    features: jax.Array | None,
    num_centroids: int,
    num_neighbors: int,
    radius: float,
    *,
    fps_idx: jax.Array | None = None,
    return_fps: bool = False,
):
    """FPS centroids -> ball query -> gather -> center on centroid.

    Parity: pointnet2_utils.py:92-120 (channels-last here). When features are
    given, the grouped features are concatenated after the centered
    coordinates, matching the reference's ``cat([grouped_norm, feat], -1)``.

    Args:
      points: ``[B, N, 3]`` geometry.
      features: optional ``[B, N, D]`` per-point features.
      num_centroids: S.
      num_neighbors: K.
      radius: ball radius.
      fps_idx: optional precomputed ``[B, S]`` centroid indices (lets MSG
        layers share one FPS across scales).
      return_fps: also return the fps indices.

    Returns:
      ``(centroids [B,S,3], grouped [B,S,K,3(+D)])`` and optionally fps_idx.
    """
    # point-sharding context: route through the hand-built O(S·K) collective
    # implementation instead of GSPMD's default gathers (parallel.context)
    from pointnet_like_pose_estimation_tpu.parallel import context as _psc

    ctx = _psc.current_point_sharding()
    if (
        ctx is not None
        and fps_idx is None
        and not return_fps
        and ctx.mesh.shape[ctx.axis] > 1
        and points.shape[1] % ctx.mesh.shape[ctx.axis] == 0
    ):
        from pointnet_like_pose_estimation_tpu.parallel.sharded_ops import (
            sharded_sample_and_group,
        )

        ctx.dispatch_count += 1
        return sharded_sample_and_group(
            points, features, num_centroids, num_neighbors, radius,
            ctx.mesh, axis=ctx.axis, batch_axis=ctx.batch_axis,
        )
    if fps_idx is None:
        fps_idx = farthest_point_sample(points, num_centroids)
    centroids = index_points(points, fps_idx)                 # [B, S, 3]

    S, N = int(num_centroids), points.shape[1]
    # query_ball_point dispatches to the Pallas kernel on TPU (the [B, S, N]
    # distance matrix stays in VMEM); on the XLA path, big S*N tiles the
    # centroid axis so the matrix never materializes in HBM
    if (
        not _grouping_impl(points.shape[0], N, S, num_neighbors).startswith("pallas")
        and S >= 128
        and N >= 4096
    ):
        idx = query_ball_point_chunked(radius, num_neighbors, points, centroids)
    else:
        idx = query_ball_point(radius, num_neighbors, points, centroids)
    grouped = index_points(points, idx)                       # [B, S, K, 3]
    grouped = grouped - centroids[:, :, None, :]
    if features is not None:
        grouped_feat = index_points(features, idx)            # [B, S, K, D]
        grouped = jnp.concatenate([grouped, grouped_feat], axis=-1)
    if return_fps:
        return centroids, grouped, fps_idx
    return centroids, grouped


def sample_and_group_all(points: jax.Array, features: jax.Array | None):
    """Single group covering the whole cloud; centroid at the origin.

    Parity: pointnet2_utils.py:122-141.

    Args:
      points: ``[B, N, 3]``.
      features: optional ``[B, N, D]``.

    Returns:
      ``(centroids [B,1,3] zeros, grouped [B,1,N,3(+D)])``.
    """
    B, N, C = points.shape
    centroids = jnp.zeros((B, 1, C), dtype=points.dtype)
    grouped = points[:, None, :, :]                           # [B, 1, N, 3]
    if features is not None:
        grouped = jnp.concatenate([grouped, features[:, None, :, :]], axis=-1)
    return centroids, grouped
