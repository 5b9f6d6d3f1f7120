"""Pallas TPU kernels for the hot point-cloud ops."""

from pointnet_like_pose_estimation_tpu.kernels.ball_group import (
    ball_query_multi_pallas,
    ball_query_pallas,
)
from pointnet_like_pose_estimation_tpu.kernels.fps import fps_pallas
from pointnet_like_pose_estimation_tpu.kernels.fused_sa import fused_sa_infer

__all__ = [
    "ball_query_multi_pallas",
    "ball_query_pallas",
    "fps_pallas",
    "fused_sa_infer",
]
