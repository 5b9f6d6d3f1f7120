"""Classification models: PointNet (v1) and PointNet++ (SSG / MSG).

Parity map (architectures, widths, dropout placement):
- PointNetCls            -> model/pointnet_cls.py:7-44
- PointNet2ClsSSG        -> model/pointnet2_cls_ssg.py:5-47
- PointNet2ClsMSG        -> model/pointnet2_cls_msg.py:5-47

All take channels-last ``[B, N, 3]`` clouds and return
``(log_probs [B, C], aux, pred_choice [B])`` where ``aux`` is the 64x64
feature transform (v1) or the 1024-d global feature (v2), matching the
reference's 3-tuple contract.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pointnet_like_pose_estimation_tpu.nn import (
    DenseHead,
    PointNetEncoder,
    SetAbstraction,
    SetAbstractionMSG,
)

Dtype = Any


class PointNetCls(nn.Module):
    """PointNet encoder + FC 512-256-C head with log-softmax output."""

    num_classes: int = 7
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, points, *, train: bool = False):
        feat, _, trans_feat = PointNetEncoder(dtype=self.dtype, name="encoder")(
            points, train=train
        )
        x = DenseHead(
            [512, 256, self.num_classes], style="cls_v1", dtype=self.dtype, name="head"
        )(feat, train=train)
        log_probs = nn.log_softmax(x.astype(jnp.float32), axis=-1)
        return log_probs, trans_feat, jnp.argmax(log_probs, axis=-1)


class PointNet2ClsSSG(nn.Module):
    """3-level single-scale set abstraction classifier."""

    num_classes: int = 7
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, points, *, train: bool = False):
        dt = self.dtype
        p, f = SetAbstraction(512, 32, 0.2, [64, 64, 128], dtype=dt, name="sa1")(
            points, None, train=train
        )
        p, f = SetAbstraction(128, 64, 0.4, [128, 128, 256], dtype=dt, name="sa2")(
            p, f, train=train
        )
        _, f = SetAbstraction(None, None, None, [256, 512, 1024], group_all=True, dtype=dt, name="sa3")(
            p, f, train=train
        )
        g = f.reshape(f.shape[0], -1)                         # [B, 1024]
        x = DenseHead(
            [512, 256, self.num_classes], style="cls_v2", dtype=dt, name="head"
        )(g, train=train)
        log_probs = nn.log_softmax(x.astype(jnp.float32), axis=-1)
        return log_probs, g, jnp.argmax(log_probs, axis=-1)


class PointNet2ClsMSG(nn.Module):
    """2 multi-scale + 1 global set abstraction classifier."""

    num_classes: int = 7
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, points, *, train: bool = False):
        dt = self.dtype
        p, f = SetAbstractionMSG(
            512, [16, 32, 128], [0.1, 0.2, 0.4],
            [[32, 32, 64], [64, 64, 128], [64, 96, 128]], dtype=dt, name="sa1",
        )(points, None, train=train)
        p, f = SetAbstractionMSG(
            128, [32, 64, 128], [0.2, 0.4, 0.8],
            [[64, 64, 128], [128, 128, 256], [128, 128, 256]], dtype=dt, name="sa2",
        )(p, f, train=train)
        _, f = SetAbstraction(None, None, None, [256, 512, 1024], group_all=True, dtype=dt, name="sa3")(
            p, f, train=train
        )
        g = f.reshape(f.shape[0], -1)
        x = DenseHead(
            [512, 256, self.num_classes], style="cls_v2", dtype=dt, name="head"
        )(g, train=train)
        log_probs = nn.log_softmax(x.astype(jnp.float32), axis=-1)
        return log_probs, g, jnp.argmax(log_probs, axis=-1)
