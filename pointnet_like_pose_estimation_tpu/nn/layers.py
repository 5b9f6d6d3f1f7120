"""Shared layers.

The reference's ubiquitous ``Conv1d/Conv2d(k=1) + BatchNorm + ReLU`` stacks
(e.g. model/rotation.py:14-18, model/pointnet2_utils.py:154-170) are
point-wise linear maps over the channel axis. Channels-last, they are plain
``Dense`` layers — XLA contracts the channel axis on the MXU with the point
and group axes batched, which is exactly the layout a TPU wants. No explicit
convolution machinery is needed anywhere in this framework.

``dtype``/``param_dtype`` follow the flax convention: params stay float32,
compute can run bfloat16.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pointnet_like_pose_estimation_tpu.nn.bn_context import bn_axis_name

Dtype = Any


def batch_norm_f32(x, *, train: bool, momentum: float = 0.9, name: str):
    """BatchNorm evaluated in float32 regardless of the surrounding compute
    dtype.

    bfloat16 normalization measurably breaks training even though flax
    computes the batch statistics in f32: pn2_ssg on the full-scale set
    sticks at ~41% train accuracy vs 99% in f32 (log/classification/
    r5_pn2_ssg_bf16), and a 200-step bisection recovers full f32 training
    the moment only the BatchNorm runs in f32 (docs/PERF.md, round 5) —
    the normalize/affine arithmetic itself needs the mantissa. So: matmuls
    stay bf16 on the MXU, normalization runs f32, and the next Dense casts
    back down. The parameter tree and the f32 path are unchanged.
    """
    if x.dtype == jnp.bfloat16:
        x = x.astype(jnp.float32)
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=momentum,
        dtype=None,
        axis_name=bn_axis_name(),
        name=name,
    )(x)


class PointwiseMLP(nn.Module):
    """Stack of Dense -> BatchNorm -> ReLU over the trailing channel axis.

    Equivalent of the reference's shared-MLP conv stacks
    (pointnet2_utils.py:154-156, rotation.py:14-18) for inputs shaped
    ``[B, ..., C]``. BatchNorm statistics reduce over every non-channel axis,
    matching ``BatchNorm1d/2d`` on ``[B, C, N]`` / ``[B, C, K, S]``.

    Attributes:
      features: output width per layer.
      final_activation: apply BN+ReLU after the last layer too (the reference
        applies it on all shared-MLP layers; PointNetEncoder's conv3 uses BN
        but no ReLU, so it passes ``final_activation=False`` and adds BN
        itself).
      dtype: compute dtype (e.g. jnp.bfloat16).
    """

    features: Sequence[int]
    final_activation: bool = True
    dtype: Dtype | None = None
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, *, train: bool):
        n = len(self.features)
        for i, width in enumerate(self.features):
            x = nn.Dense(width, dtype=self.dtype, name=f"dense_{i}")(x)
            if i < n - 1 or self.final_activation:
                x = batch_norm_f32(
                    x, train=train, momentum=self.bn_momentum, name=f"bn_{i}"
                )
                x = nn.relu(x)
        return x


class DenseHead(nn.Module):
    """Fully-connected head with the reference's three BN/dropout orderings.

    ``style`` selects the exact op order the corresponding reference model
    uses on its hidden layers (the final layer is always a plain Dense):

    - ``"cls_v1"``: relu(bn(fc)) then relu(bn(dropout(fc))) — pointnet_cls.py:25-28
      (dropout only on the second hidden layer, before its BN).
    - ``"cls_v2"``: dropout(relu(bn(fc))) per hidden layer — pointnet2_cls_ssg.py:31-34.
    - ``"pose"``: relu(dropout(bn(fc))) per hidden layer — rotation.py:45-49.

    Attributes:
      features: widths including the final output width.
      style: one of cls_v1/cls_v2/pose.
      dropout_rate: reference default 0.4.
    """

    features: Sequence[int]
    style: str = "pose"
    dropout_rate: float = 0.4
    dtype: Dtype | None = None
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, *, train: bool):
        assert self.style in ("cls_v1", "cls_v2", "pose"), self.style
        n = len(self.features)
        for i, width in enumerate(self.features):
            x = nn.Dense(width, dtype=self.dtype, name=f"fc_{i}")(x)
            if i == n - 1:
                break
            bn = lambda v, _i=i: batch_norm_f32(
                v, train=train, momentum=self.bn_momentum, name=f"bn_{_i}"
            )
            drop = nn.Dropout(self.dropout_rate, deterministic=not train)
            if self.style == "cls_v1":
                # second hidden layer of pointnet_cls drops before BN
                x = nn.relu(bn(drop(x) if i == 1 else x))
            elif self.style == "cls_v2":
                x = drop(nn.relu(bn(x)))
            else:  # pose
                x = nn.relu(drop(bn(x)))
        return x
