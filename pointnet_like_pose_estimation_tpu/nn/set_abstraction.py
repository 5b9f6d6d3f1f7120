"""PointNet++ set-abstraction layers (SSG and MSG).

Parity: model/pointnet2_utils.py — PointNetSetAbstraction (:143-174) and
PointNetSetAbstractionMsg (:176-223), channels-last. The grouped tensor is
``[B, S, K, C]``: the shared MLP contracts C on the MXU with (B, S, K)
batched, and the group max reduces K on the VPU. MSG runs one FPS and shares
the centroids across all radius scales (reference :201), concatenating the
per-scale features on the channel axis.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnet_like_pose_estimation_tpu.nn.layers import PointwiseMLP
from pointnet_like_pose_estimation_tpu.ops import (
    farthest_point_sample,
    index_points,
    query_ball_point,
    sample_and_group,
    sample_and_group_all,
)
from pointnet_like_pose_estimation_tpu.ops.grouping import _grouping_impl

Dtype = Any


class SetAbstraction(nn.Module):
    """Single-scale grouping: FPS -> ball query -> shared MLP -> max.

    Attributes:
      num_centroids: S (ignored when group_all).
      num_neighbors: K per ball (ignored when group_all).
      radius: ball radius (ignored when group_all).
      mlp: shared-MLP widths.
      group_all: final global layer (sample_and_group_all).
    """

    num_centroids: int | None
    num_neighbors: int | None
    radius: float | None
    mlp: Sequence[int]
    group_all: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, points, features, *, train: bool):
        """points: [B, N, 3]; features: [B, N, D] or None.

        Returns (centroids [B, S, 3], features [B, S, mlp[-1]]).
        """
        if self.group_all:
            centroids, grouped = sample_and_group_all(points, features)
        else:
            centroids, grouped = sample_and_group(
                points, features, self.num_centroids, self.num_neighbors, self.radius
            )
        h = PointwiseMLP(self.mlp, dtype=self.dtype, name="mlp")(grouped, train=train)
        return centroids, jnp.max(h, axis=-2)                 # reduce K


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping: one FPS, per-radius ball query + MLP, concat.

    ``extra_channels`` mirrors the reference's ``in_channel + 3 +
    num_category`` bookkeeping (pointnet2_utils.py:187): pose backbones feed
    one-hot-spliced features, and the widths here only matter for
    initialization (channels are inferred from inputs in flax).
    """

    num_centroids: int
    num_neighbors_list: Sequence[int]
    radius_list: Sequence[float]
    mlp_list: Sequence[Sequence[int]]
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, points, features, *, train: bool):
        """points: [B, N, 3]; features: [B, N, D] or None.

        Returns (centroids [B, S, 3], features [B, S, sum(mlp[-1])]).
        """
        from pointnet_like_pose_estimation_tpu.parallel import context as _psc

        ctx = _psc.current_point_sharding()
        if (
            ctx is not None
            and ctx.mesh.shape[ctx.axis] > 1
            and points.shape[1] % ctx.mesh.shape[ctx.axis] == 0
        ):
            # distributed multi-scale grouping: one distributed FPS + one
            # shard-local distance matrix shared by every radius scale
            from pointnet_like_pose_estimation_tpu.parallel.sharded_ops import (
                sharded_sample_and_group_multi,
            )

            ctx.dispatch_count += 1
            centroids, grouped_list = sharded_sample_and_group_multi(
                points, features, self.num_centroids,
                self.radius_list, self.num_neighbors_list,
                ctx.mesh, axis=ctx.axis, batch_axis=ctx.batch_axis,
            )
            outs = []
            for i, grouped in enumerate(grouped_list):
                h = PointwiseMLP(
                    self.mlp_list[i], dtype=self.dtype, name=f"mlp_{i}"
                )(grouped, train=train)
                outs.append(jnp.max(h, axis=-2))
            return centroids, jnp.concatenate(outs, axis=-1)
        fps_idx = farthest_point_sample(points, self.num_centroids)
        centroids = index_points(points, fps_idx)
        # the fused multi-scale kernel amortizes ONE distance matmul across
        # all radius scales, so its dispatch shape is the LARGEST K
        impl = _grouping_impl(
            points.shape[0], points.shape[1], self.num_centroids,
            max(self.num_neighbors_list), multi_scale=True,
        )
        if impl.startswith("pallas") and self.num_centroids % 8 == 0:
            from pointnet_like_pose_estimation_tpu.kernels.ball_group import (
                ball_query_multi_pallas,
            )

            # ONE fused kernel for every radius scale: the distance matmul is
            # computed once per centroid tile and shared (SURVEY §7.7; the
            # reference recomputes it per scale, pointnet2_utils.py:203-219)
            # indices are non-differentiable; stop_gradient keeps autodiff
            # from tracing into the pallas_call (no JVP rule)
            idx_all = ball_query_multi_pallas(
                jax.lax.stop_gradient(points),
                jax.lax.stop_gradient(centroids),
                tuple(float(r) for r in self.radius_list),
                tuple(int(k) for k in self.num_neighbors_list),
                interpret=impl == "pallas_interpret",
            )
            offsets = [0]
            for K in self.num_neighbors_list:
                offsets.append(offsets[-1] + K)
            idx_list = [
                idx_all[:, :, offsets[i] : offsets[i + 1]]
                for i in range(len(self.num_neighbors_list))
            ]
        else:
            idx_list = [
                query_ball_point(radius, K, points, centroids)
                for radius, K in zip(self.radius_list, self.num_neighbors_list)
            ]
        outs = []
        for i, idx in enumerate(idx_list):
            grouped = index_points(points, idx) - centroids[:, :, None, :]
            if features is not None:
                # reference order: [features, centered_coords]
                # (pointnet2_utils.py:211)
                gfeat = index_points(features, idx)
                grouped = jnp.concatenate([gfeat, grouped], axis=-1)
            h = PointwiseMLP(self.mlp_list[i], dtype=self.dtype, name=f"mlp_{i}")(
                grouped, train=train
            )
            outs.append(jnp.max(h, axis=-2))
        return centroids, jnp.concatenate(outs, axis=-1)
