"""Fused farthest-point-sampling Pallas kernel.

FPS is the sequential hot spot of every set-abstraction layer (SURVEY §3.3:
a 512-iteration loop whose every step depends on the argmax of the running
min-distance vector — reference pointnet2_utils.py:47-68). The kernel keeps
the ENTIRE loop state on-chip: one grid program per cloud holds the [3, N]
coordinates (points on the lane axis — 8x128 tiles, ~32 KB for N=4096) and
the [1, N] min-distance vector in VMEM for all S iterations, so HBM traffic
is exactly one read of the cloud and one write of the S indices, instead of
S round-trips.

Numerics match ops.sampling.farthest_point_sample exactly (same argmax
tie-breaking: first index wins), so the two are interchangeable and golden-
tested against each other.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(start_ref, points_ref, idx_ref, dist_ref, *, num_samples: int):
    """One program = one cloud. points_ref: [1, C, N]; idx_ref: [1, 1, S]
    (leading singleton keeps the block's trailing dims tile-aligned);
    start_ref: the full [B] start-index vector in SMEM (scalar-prefetch)."""
    N = points_ref.shape[-1]
    S = idx_ref.shape[-1]
    b = pl.program_id(0)
    dist_ref[...] = jnp.full((1, N), 1e10, dtype=jnp.float32)
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)

    def body(i, farthest):
        # vector write of slot i (Mosaic cannot store scalars to VMEM)
        idx_ref[0] = jnp.where(slot == i, farthest, idx_ref[0])
        # centroid = points[:, farthest]  (dynamic lane slice, stays in VMEM)
        centroid = points_ref[0, :, pl.ds(farthest, 1)]       # [3, 1]
        diff = points_ref[0, :, :] - centroid                 # [3, N]
        d = jnp.sum(diff * diff, axis=0, keepdims=True)       # [1, N]
        new_dist = jnp.minimum(dist_ref[...], d)
        dist_ref[...] = new_dist
        return jnp.argmax(new_dist[0, :]).astype(jnp.int32)

    jax.lax.fori_loop(0, num_samples, body, start_ref[b])


@functools.partial(jax.jit, static_argnames=("num_samples", "interpret"))
def fps_pallas(
    points: jax.Array,
    num_samples: int,
    *,
    start_idx: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in Pallas replacement for ops.farthest_point_sample.

    Args:
      points: [B, N, C] clouds (C<=8; only coordinates are used).
      num_samples: S (static).
      start_idx: optional [B] int32 initial centroid (default 0).
      interpret: run in interpreter mode (CPU tests).

    Returns:
      [B, S] int32 indices.
    """
    B, N, C = points.shape
    if start_idx is None:
        start_idx = jnp.zeros((B,), jnp.int32)
    # lanes-major layout: [B, C, N]
    pts = jnp.swapaxes(points.astype(jnp.float32), 1, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # start indices land in SMEM, whole vector
        grid=(B,),
        in_specs=[
            # index_map args: (grid index, scalar-prefetch ref)
            pl.BlockSpec((1, C, N), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, num_samples), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((1, N), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_fps_kernel, num_samples=num_samples),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, num_samples), jnp.int32),
        interpret=interpret,
    )(start_idx.astype(jnp.int32), pts)
    return out[:, 0, :]
