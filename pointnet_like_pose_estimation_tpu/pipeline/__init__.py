"""Perception pipeline: RGB-D -> point cloud -> preprocess -> cluster ->
classify -> pose (the end-to-end graph of README.md:10-28 that the reference
never finished wiring)."""

from pointnet_like_pose_estimation_tpu.pipeline.deproject import (
    CameraIntrinsics,
    deproject_depth,
)
from pointnet_like_pose_estimation_tpu.pipeline.preprocess import (
    clip_distance,
    cluster_point,
    dbscan,
    ransac_plane,
    clean_scene,
    remove_plane,
    remove_radius_outlier,
    remove_statistical_outlier,
)
from pointnet_like_pose_estimation_tpu.pipeline.infer import (
    GraspPipeline,
    PipelineConfig,
)

__all__ = [
    "CameraIntrinsics",
    "deproject_depth",
    "clip_distance",
    "cluster_point",
    "dbscan",
    "ransac_plane",
    "clean_scene",
    "remove_plane",
    "remove_radius_outlier",
    "remove_statistical_outlier",
    "GraspPipeline",
    "PipelineConfig",
]
