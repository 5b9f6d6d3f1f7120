"""Scaling via jax.sharding meshes — the TPU-native replacement for the
reference's host concurrency (SURVEY §2.8: single GPU + host threads)."""

from pointnet_like_pose_estimation_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from pointnet_like_pose_estimation_tpu.parallel.context import (
    current_point_sharding,
    point_sharding,
)
from pointnet_like_pose_estimation_tpu.parallel.sharded_ops import (
    sharded_farthest_point_sample,
    sharded_sample_and_group,
    sharded_sample_and_group_multi,
)
from pointnet_like_pose_estimation_tpu.parallel.multihead import (
    MultiHeadParallel,
)
from pointnet_like_pose_estimation_tpu.parallel.tensor_parallel import (
    count_sharded,
    shard_state_tp,
    tensor_parallel_shardings,
    tensor_parallel_specs,
)
from pointnet_like_pose_estimation_tpu.parallel.train_parallel import (
    make_parallel_train_step,
)

__all__ = [
    "MultiHeadParallel",
    "batch_sharding",
    "count_sharded",
    "current_point_sharding",
    "make_mesh",
    "point_sharding",
    "replicate",
    "shard_batch",
    "shard_state_tp",
    "make_parallel_train_step",
    "sharded_farthest_point_sample",
    "sharded_sample_and_group",
    "sharded_sample_and_group_multi",
    "tensor_parallel_shardings",
    "tensor_parallel_specs",
]
