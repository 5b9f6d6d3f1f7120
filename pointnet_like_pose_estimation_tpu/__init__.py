"""TPU-native point-cloud perception and pose-estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Regen2001/PointNet-Like-Pose-Estimation (reference mounted read-only at
/root/reference): RGB-D point-cloud preprocessing (distance cut, plane
removal, outlier rejection, clustering), PointNet / PointNet++
classification, and PointNet-like pose heads (rotation, sign,
translation, width) — built TPU-first:

- channels-last ``[B, N, C]`` layouts everywhere so point-wise MLPs map to
  MXU matmuls,
- all hot ops (FPS, ball query, grouping) as pure jittable functions with
  Pallas TPU kernels for the sequential/sorting-heavy parts,
- augmentation fused into the jitted train step via ``jax.random``,
- scaling via ``jax.sharding`` meshes (data parallel + head parallel),
  not host threads.
"""

__version__ = "0.1.0"

from pointnet_like_pose_estimation_tpu import ops  # noqa: F401
