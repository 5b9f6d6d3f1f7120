"""Pure-function point-cloud ops (jnp reference impls + Pallas TPU kernels).

Parity targets: /root/reference/model/pointnet2_utils.py (square_distance,
index_points, farthest_point_sample, query_ball_point, sample_and_group,
sample_and_group_all) and /root/reference/provider.py (normalization,
euler rotation helpers).
"""

from pointnet_like_pose_estimation_tpu.ops.geometry import (
    euler_rotation_matrix,
    index_points,
    normalize_cloud,
    rotate_euler,
    square_distance,
)
from pointnet_like_pose_estimation_tpu.ops.sampling import (
    farthest_point_sample,
    random_sample,
)
from pointnet_like_pose_estimation_tpu.ops.grouping import (
    query_ball_point,
    sample_and_group,
    sample_and_group_all,
)

__all__ = [
    "euler_rotation_matrix",
    "index_points",
    "normalize_cloud",
    "rotate_euler",
    "square_distance",
    "farthest_point_sample",
    "random_sample",
    "query_ball_point",
    "sample_and_group",
    "sample_and_group_all",
]
