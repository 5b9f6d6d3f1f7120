"""Neural building blocks (flax.linen, channels-last, bf16-ready)."""

from pointnet_like_pose_estimation_tpu.nn.layers import (
    DenseHead,
    PointwiseMLP,
    batch_norm_f32,
)
from pointnet_like_pose_estimation_tpu.nn.tnet import (
    PointNetEncoder,
    TNet,
    orthogonality_regularizer,
)
from pointnet_like_pose_estimation_tpu.nn.set_abstraction import (
    SetAbstraction,
    SetAbstractionMSG,
)

__all__ = [
    "DenseHead",
    "PointwiseMLP",
    "batch_norm_f32",
    "PointNetEncoder",
    "TNet",
    "orthogonality_regularizer",
    "SetAbstraction",
    "SetAbstractionMSG",
]
