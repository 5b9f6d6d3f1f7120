"""Spatial/feature transformer networks (T-Nets) and the PointNet encoder.

Parity: model/pointnet_utils.py — TNet3d (:9-43), TNetkd (:45-81),
PointNetEncoder (:83-138), feature_transform_reguliarzer (:140-147).

Channels-last redesign: the reference left-multiplies ``bmm(T, x)`` on
``[B, C, N]`` tensors; here clouds are ``[B, N, C]`` so the same transform is
``x @ Tᵀ``. The predicted transforms are initialized at identity by zeroing
the last layer and seeding its bias with the flattened identity — same
fixed point as the reference's ``+ I`` residual, but with zero variance at
init instead of lecun noise around I.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pointnet_like_pose_estimation_tpu.nn.layers import PointwiseMLP, batch_norm_f32
from pointnet_like_pose_estimation_tpu.nn.bn_context import bn_axis_name

Dtype = Any


class TNet(nn.Module):
    """Predicts a ``[k, k]`` transform from a ``[B, N, k]`` cloud.

    Shared MLP 64-128-1024 -> max over points -> FC 512-256 -> k*k,
    exactly the widths of pointnet_utils.py:9-81 (TNet3d == TNet(k=3),
    TNetkd == TNet(k=channel)).
    """

    k: int
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        B = x.shape[0]
        h = PointwiseMLP([64, 128, 1024], dtype=self.dtype, name="mlp")(x, train=train)
        h = jnp.max(h, axis=-2)                               # [B, 1024]
        h = PointwiseMLP([512, 256], dtype=self.dtype, name="fc")(h, train=train)
        eye = jnp.eye(self.k, dtype=jnp.float32).reshape(-1)
        h = nn.Dense(
            self.k * self.k,
            kernel_init=nn.initializers.zeros_init(),
            bias_init=lambda *_: eye,
            dtype=self.dtype,
            name="out",
        )(h)
        return h.reshape(B, self.k, self.k)


def orthogonality_regularizer(transform: jax.Array) -> jax.Array:
    """``mean_b ||T Tᵀ - I||_F`` — pointnet_utils.py:140-147."""
    k = transform.shape[-1]
    eye = jnp.eye(k, dtype=transform.dtype)
    ttt = jnp.matmul(transform, jnp.swapaxes(transform, -1, -2)) - eye
    return jnp.mean(jnp.sqrt(jnp.sum(ttt * ttt, axis=(-2, -1)) + 1e-12))


class PointNetEncoder(nn.Module):
    """PointNet global feature encoder with input + feature transforms.

    Parity with pointnet_utils.py:83-138: TNet3d -> transform -> conv 64 ->
    TNetkd(64) -> feature transform -> conv 128 -> conv 1024 (BN, no ReLU) ->
    global max-pool. ``global_feat=False`` concatenates the global vector onto
    the 64-d point features (segmentation-style output, :137-138).

    Returns ``(feature, input_transform, feature_transform)``.
    """

    global_feat: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x, *, train: bool):
        B, N, D = x.shape
        tin = TNet(k=3, dtype=self.dtype, name="tnet_input")(x[..., :3], train=train)
        geo = jnp.einsum("bnc,bdc->bnd", x[..., :3], tin)
        if D > 3:
            x = jnp.concatenate([geo, x[..., 3:]], axis=-1)
        else:
            x = geo
        x = PointwiseMLP([64], dtype=self.dtype, name="conv1")(x, train=train)
        tfeat = TNet(k=64, dtype=self.dtype, name="tnet_feature")(x, train=train)
        x = jnp.einsum("bnc,bdc->bnd", x, tfeat)
        point_feat = x
        x = PointwiseMLP([128], dtype=self.dtype, name="conv2")(x, train=train)
        x = nn.Dense(1024, dtype=self.dtype, name="conv3")(x)
        x = batch_norm_f32(x, train=train, name="bn3")
        x = jnp.max(x, axis=-2)                               # [B, 1024]
        if self.global_feat:
            return x, tin, tfeat
        tiled = jnp.broadcast_to(x[:, None, :], (B, N, 1024))
        return jnp.concatenate([tiled, point_feat], axis=-1), tin, tfeat
