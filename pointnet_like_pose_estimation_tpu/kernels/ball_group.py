"""Fused ball-query Pallas kernel (single- and multi-scale selection).

The XLA path of ``sample_and_group`` materializes the [B, S, N] distance
matrix in HBM and runs top_k over it (SURVEY §3.3 hot spots). This kernel
keeps the distance tile in VMEM per (batch row, centroid tile):

- distances via one MXU matmul (centroid tile @ pointsᵀ),
- the reference's "K lowest in-ball indices" selection (pointnet2_utils.py:
  70-90 sort-semantics) as K iterations of a masked lane-min — Mosaic has no
  top_k/sort, but a min-reduction over an index-valued key vector IS the
  argmin, and K is small (16-128),
- pad-with-first-in-ball fused in.

The kernel emits ONLY the [B, S, K] int32 indices; neighborhood gathers and
centroid subtraction stay in XLA (``ops.index_points``). Rationale, measured
on v5e: an in-kernel one-hot-matmul gather costs K·T·N·C MXU flops — an N×
blowup over the K·T·C values actually fetched — and its [ΣK, T, C] output
block forces tiny centroid tiles (T=8 on MSG layer 2), collapsing MXU
utilization; XLA's native gather pays only the output bytes. Indices are
also K·C× less HBM write traffic than grouped tensors. Because the kernel
output is integer, no custom VJP is needed — gradients flow through the XLA
gathers (scatter-add transpose), exactly the reference's backward.

Multi-scale grouping (PointNetSetAbstractionMsg, pointnet2_utils.py:176-223)
re-queries the SAME centroids at L radii. ``ball_query_multi_pallas`` fuses
the scales: ONE distance matmul per (row, centroid-tile) program serves
every radius — the per-scale selection loops just re-threshold the resident
[T, N] distance tile — and the indices land in one [B, S, ΣK] tensor (scale
l at K-offset ``sum(K[:l])``). The reference recomputes the full distance
matrix per scale (:203-219).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ball_query_kernel(
    pts_ref,        # [1, N, P]  point channels (coords + any spliced one-hot)
    cent_ref,       # [1, T, P]  centroid tile
    idx_ref,        # [1, 1, ΣK, T] int32 out — selected (post-pad) indices;
    #                 ΣK leading so the dynamic-k store hits a non-tiled
    #                 dimension (Mosaic constraint), T in lanes
    sel_ref,        # [T, N] f32 scratch: 1.0 where already selected
    fidx_ref,       # [T, 1] i32 scratch: slot-0 index (pad source)
    *,
    radii: tuple[float, ...],
    ks: tuple[int, ...],
):
    N = pts_ref.shape[1]
    T = cent_ref.shape[1]

    pts = pts_ref[0]                                          # [N, P]
    cent = cent_ref[0]                                        # [T, P]

    # squared distances [T, N] — inner product on the MXU, computed ONCE and
    # shared by every radius scale. HIGHEST precision: the default bf16
    # passes truncate coordinates, flipping in-ball membership at the radius
    # boundary vs the XLA path
    inner = jnp.dot(cent, pts.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = (
        jnp.sum(cent * cent, axis=-1, keepdims=True)
        - 2.0 * inner
        + jnp.sum(pts * pts, axis=-1)[None, :]
    )

    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    sentinel = jnp.int32(N)

    k_offset = 0
    for radius, K in zip(radii, ks):                          # static scales
        in_ball = d2 <= radius * radius                       # [T, N]

        # loop state lives in VMEM scratch (Mosaic cannot legalize scf.for
        # with large vector iter_args); reset per scale
        sel_ref[...] = jnp.zeros((T, N), jnp.float32)
        fidx_ref[...] = jnp.zeros((T, 1), jnp.int32)

        def body(k, _, in_ball=in_ball, k_offset=k_offset):
            keys = jnp.where(in_ball & (sel_ref[...] == 0.0), lane_idx, sentinel)
            cur = jnp.min(keys, axis=-1, keepdims=True)       # [T, 1] lowest unused
            # pad-with-first semantics: empty slot -> duplicate slot 0's index
            empty = cur == sentinel                           # [T, 1]

            @pl.when(k == 0)
            def _():
                fidx_ref[...] = cur

            # clamp the fully-empty-ball case (fidx == sentinel) to N-1 so
            # every impl agrees on the degenerate case (see ops.grouping)
            idx_ref[0, 0, k_offset + k] = jnp.minimum(
                jnp.where(empty, fidx_ref[...], cur), sentinel - 1
            ).reshape(T)
            sel_ref[...] = jnp.maximum(
                sel_ref[...], (lane_idx == cur).astype(jnp.float32)
            )
            return 0

        jax.lax.fori_loop(0, K, body, 0)
        k_offset += K


def _pick_tile(N: int, S: int, K: int, max_tile: int) -> int:
    """Largest divisor T of S (≤ max_tile) whose per-program working set fits
    the scoped-VMEM budget (~16 MB/core on v5e; we target 12 MB to leave room
    for Mosaic temporaries). K is the TOTAL selection count (ΣK over scales).
    Accounts for Mosaic tiling pads: last dim → 128 lanes, second-to-last →
    8 sublanes, and double-buffered grid blocks."""
    budget = int(os.environ.get("PLPE_BALLGROUP_VMEM_BUDGET", 12 * 2**20))
    up = lambda x, m: -(-x // m) * m  # noqa: E731
    Np = up(N, 128)
    t = min(max_tile, S)
    while t > 8:
        if S % t == 0:
            Tp = up(t, 8)
            blocks = 2 * 4 * (         # double-buffered grid blocks
                K * up(t, 128)         # idx [ΣK, T]
                + up(N, 8) * 128       # pts [N, P] (P pads to one lane tile)
                + Tp * 128             # centroid tile [T, P]
            )
            scratch = 4 * (Tp * Np + Tp * 128)           # sel/fidx
            work = 4 * 4 * Tp * Np                       # d2/keys/onehot temps
            if blocks + scratch + work <= budget:
                return t
        t //= 2
    return t


@functools.partial(
    jax.jit, static_argnames=("radii", "ks", "tile", "interpret")
)
def ball_query_multi_pallas(
    points: jax.Array,
    centroids: jax.Array,
    radii: tuple[float, ...],
    ks: tuple[int, ...],
    tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused MULTI-SCALE ball query: [B, S, ΣK] int32 neighbor indices.

    One Pallas program per (batch row, centroid tile) computes the distance
    matmul once and selects every radius scale from it — the MSG fusion of
    SURVEY §7.7 (reference recomputes distances per scale,
    pointnet2_utils.py:203-219). Scale l occupies K-slots
    ``sum(ks[:l]) : sum(ks[:l+1])``. Semantics per scale are exactly
    ``ops.query_ball_point`` (K lowest in-ball indices, empty slots padded
    with the first in-ball index).

    Args:
      points: [B, N, P] point channels (coords + any spliced one-hot) —
        distances use ALL P channels, the reference's behavior for spliced
        pose inputs.
      centroids: [B, S, P] query points.
      radii: per-scale ball radii (static tuple).
      ks: per-scale neighbor counts K_l (static tuple).
      tile: max centroid tile per grid program.
    """
    B, N, P = points.shape
    _, S, _ = centroids.shape
    K = sum(ks)
    T = _pick_tile(N, S, K, tile)
    assert S % T == 0, (S, T)

    idx = pl.pallas_call(
        functools.partial(_ball_query_kernel, radii=radii, ks=ks),
        grid=(B, S // T),
        in_specs=[
            pl.BlockSpec((1, N, P), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, P), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, K, T), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, S // T, K, T), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((T, N), jnp.float32),
            pltpu.VMEM((T, 1), jnp.int32),
        ],
        interpret=interpret,
    )(points.astype(jnp.float32), centroids.astype(jnp.float32))
    # [B, S/T, K, T] -> [B, S, K]
    return jnp.swapaxes(idx, 2, 3).reshape(B, S, K)


def ball_query_pallas(
    points: jax.Array,
    centroids: jax.Array,
    radius: float,
    num_neighbors: int,
    tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Single-scale fused ball query: [B, S, K] int32 indices.

    Drop-in Pallas replacement for ``ops.query_ball_point`` — SSG layers
    (pointnet2_utils.py:143-174) and the golden tests use this entry point.
    """
    return ball_query_multi_pallas(
        points, centroids, (float(radius),), (int(num_neighbors),), tile, interpret
    )
