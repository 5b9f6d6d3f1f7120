"""Pallas TPU kernels for the hot point-cloud ops."""

from pointnet_like_pose_estimation_tpu.kernels.fps import fps_pallas

__all__ = ["fps_pallas"]
