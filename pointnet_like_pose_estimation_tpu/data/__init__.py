"""Data subsystem: synthetic generators, dataset packing, augmentation, IO."""

from pointnet_like_pose_estimation_tpu.data.generators import (
    CATEGORIES,
    clip_half,
    cube_surface,
    cube_cylinder_surface,
    cylinder_surface,
    double_cube_surface,
    double_cylinder_surface,
    h_structure_surface,
    sample_category_params,
)
from pointnet_like_pose_estimation_tpu.data.dataset import (
    PoseDataset,
    build_dataset,
    iter_batches,
    load_dataset,
    load_reference_layout,
)
from pointnet_like_pose_estimation_tpu.data import augment

__all__ = [
    "CATEGORIES",
    "clip_half",
    "cube_surface",
    "cube_cylinder_surface",
    "cylinder_surface",
    "double_cube_surface",
    "double_cylinder_surface",
    "h_structure_surface",
    "sample_category_params",
    "PoseDataset",
    "build_dataset",
    "iter_batches",
    "load_dataset",
    "load_reference_layout",
    "augment",
]
