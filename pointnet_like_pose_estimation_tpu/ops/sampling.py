"""Point sub-sampling: farthest point sampling (FPS) and random sampling.

FPS has a hard sequential dependency across iterations (each new centroid
depends on the argmax of the running min-distance vector), so we parallelize
across the batch and keep the per-iteration state (distance vector, current
farthest index) in registers/VMEM via ``lax.fori_loop``. A fused Pallas
kernel that keeps the whole loop on-chip lives in
``pointnet_like_pose_estimation_tpu.kernels.fps`` — this module is the
XLA reference implementation and the numerics oracle.

Parity: farthest_point_sample follows pointnet2_utils.py:47-68 with one
deliberate divergence — the reference seeds the first centroid with
``torch.randint`` (pointnet2_utils.py:59); we take an explicit
``start_idx`` (default 0, or pass indices sampled from a jax PRNG key) so
runs are reproducible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sample(
    points: jax.Array,
    num_samples: int,
    *,
    start_idx: jax.Array | int = 0,
    key: jax.Array | None = None,
) -> jax.Array:
    """Iterative farthest point sampling over batched clouds.

    Args:
      points: ``[B, N, C]`` clouds (only used for geometry; C typically 3).
      num_samples: number S of points to select (static).
      start_idx: ``[B]`` or scalar initial centroid index per cloud.
      key: optional PRNG key; when given, overrides ``start_idx`` with a
        uniform random index per cloud (reference behavior,
        pointnet2_utils.py:59).

    Returns:
      ``[B, S]`` int32 indices of the selected points.
    """
    B, N, C = points.shape
    S = int(num_samples)
    if key is not None:
        start = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
    else:
        start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (B,))

    from pointnet_like_pose_estimation_tpu.kernels.flags import fps_impl

    impl = fps_impl(B, N)
    if impl.startswith("pallas"):
        from pointnet_like_pose_estimation_tpu.kernels.fps import fps_pallas

        # indices are non-differentiable; stop_gradient keeps tangents
        # symbolically zero so pallas_call's (missing) JVP rule is never hit
        return fps_pallas(
            jax.lax.stop_gradient(points), S, start_idx=start,
            interpret=impl == "pallas_interpret",
        )

    def body(i, carry):
        dist, farthest, idx_out = carry
        idx_out = idx_out.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(points, farthest[:, None, None], axis=1)  # [B,1,C]
        d = jnp.sum((points - centroid) ** 2, axis=-1)        # [B, N]
        dist = jnp.minimum(dist, d)
        farthest = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return dist, farthest, idx_out

    dist0 = jnp.full((B, N), 1e10, dtype=points.dtype)
    idx0 = jnp.zeros((B, S), dtype=jnp.int32)
    _, _, idx = jax.lax.fori_loop(0, S, body, (dist0, start, idx0))
    return idx


def random_sample(key: jax.Array, points: jax.Array, num_samples: int) -> jax.Array:
    """Uniformly sample ``num_samples`` distinct points per cloud.

    Device-side equivalent of ModelDataLoader.py:33-46 (``np.random.choice``
    without replacement), batched: a per-cloud random permutation truncated to
    S, realized as top-k over random keys so shapes stay static.

    Args:
      key: PRNG key.
      points: ``[B, N, C]``.
      num_samples: S <= N.

    Returns:
      ``[B, S, C]`` sampled points.
    """
    B, N, _ = points.shape
    scores = jax.random.uniform(key, (B, N))
    _, idx = jax.lax.top_k(scores, num_samples)               # [B, S] distinct
    return jnp.take_along_axis(points, idx[..., None], axis=1)
