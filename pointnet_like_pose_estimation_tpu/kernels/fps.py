"""Fused farthest-point-sampling Pallas kernel.

FPS is the sequential hot spot of every set-abstraction layer (SURVEY §3.3:
a 512-iteration loop whose every step depends on the argmax of the running
min-distance vector — reference pointnet2_utils.py:47-68). The iterations
cannot be parallelized, so the kernel widens each one instead: a whole TILE
of batch rows advances together, with the full loop state on-chip —
coordinates [Bt, C, N], the running min-distance matrix [Bt, N], and the
per-row current-farthest vector all live in VMEM across the S iterations.
HBM traffic is one read of the clouds and one write of the [B, S] indices,
and every VPU op is a dense [Bt, N] tile (sublanes × lanes) instead of the
[1, N] stripe a per-cloud kernel would process (the Pallas TPU grid is
sequential on a core, so batch-parallelism must come from within the block).

The per-row centroid gather (points[b, :, farthest[b]]) is a lane-mask
multiply + reduce: Mosaic cannot legalize dynamic lane slices (128-aligned
offsets only), and the mask form is O(C·N) — the same cost as the distance
step itself.

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


def _fps_kernel(
    start_ref,      # [B] i32 in SMEM (scalar-prefetch): per-cloud start index
    points_ref,     # [Bt, C, N] f32 in VMEM
    idx_ref,        # [Bt, S] i32 out
    dist_ref,       # [Bt, N] f32 scratch: running min distance
    far_ref,        # [Bt, 1] i32 scratch: current farthest per row
    *,
    num_samples: int,
    tile: int,
):
    C, N = points_ref.shape[1], points_ref.shape[2]
    S = num_samples
    Bt = tile
    g = pl.program_id(0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (Bt, N), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (Bt, S), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (Bt, 1), 0)

    dist_ref[...] = jnp.full((Bt, N), 1e10, dtype=jnp.float32)
    # per-row start index from the prefetched vector
    starts = jnp.zeros((Bt, 1), jnp.int32)
    for r in range(Bt):
        starts = jnp.where(row == r, start_ref[g * Bt + r], starts)
    far_ref[...] = starts

    def body(i, _):
        far = far_ref[...]                                    # [Bt, 1]
        idx_ref[...] = jnp.where(slot == i, far, idx_ref[...])
        mask = (lane == far).astype(jnp.float32)              # [Bt, N]
        d = jnp.zeros((Bt, N), jnp.float32)
        for c in range(C):                                    # C static (=3)
            ch = points_ref[:, c, :]                          # [Bt, N]
            centroid = jnp.sum(ch * mask, axis=1, keepdims=True)
            d = d + (ch - centroid) ** 2
        new_dist = jnp.minimum(dist_ref[...], d)
        dist_ref[...] = new_dist
        far_ref[...] = jnp.argmax(new_dist, axis=1, keepdims=True).astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, S, body, 0)


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
      points: [B, N, C] clouds (C small; only coordinates are used).
      num_samples: S (static).
      start_idx: optional [B] int32 initial centroid (default 0).
      interpret: run in interpreter mode (CPU tests).

    Returns:
      [B, S] int32 indices.
    """
    B, N, C = points.shape
    if start_idx is None:
        start_idx = jnp.zeros((B,), jnp.int32)
    # whole batch in one program when it fits; otherwise row tiles. State per
    # row ≈ (C+1)·N·4 bytes -> 16 KB at N=1024, so 256 rows stay under 4 MB.
    # Mosaic requires the block's sublane dim (rows) divisible by 8 unless it
    # equals the array dim, so the batch is padded to a multiple of 8 (pad
    # rows repeat row 0; their outputs are discarded) and the tile is the
    # largest multiple of 8 within budget that divides the padded batch.
    max_rows = max(1, (4 * 2**20) // ((C + 1) * N * 4))
    if B <= max_rows:
        tile, Bp = B, B
    else:
        Bp = -(-B // 8) * 8
        tile = max((t for t in range(8, max_rows + 1, 8) if Bp % t == 0),
                   default=8)
    pts = jnp.swapaxes(points.astype(jnp.float32), 1, 2)      # [B, C, N]
    if Bp != B:
        pts = jnp.concatenate(
            [pts, jnp.broadcast_to(pts[:1], (Bp - B, C, N))], axis=0
        )
        start_idx = jnp.concatenate(
            [start_idx, jnp.zeros((Bp - B,), start_idx.dtype)]
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # start indices land in SMEM, whole vector
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((tile, C, N), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, num_samples), lambda i, s: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, N), jnp.float32),
            pltpu.VMEM((tile, 1), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fps_kernel, num_samples=num_samples, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, num_samples), jnp.int32),
        interpret=interpret,
    )(start_idx.astype(jnp.int32), pts)
    return out[:B]
