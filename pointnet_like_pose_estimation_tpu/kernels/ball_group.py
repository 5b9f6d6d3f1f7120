"""Fused ball-query + gather + center Pallas kernel (single- and multi-scale).

The XLA path of ``sample_and_group`` materializes the [B, S, N] distance
matrix in HBM, runs top_k over it, then two gathers (SURVEY §3.3 hot spots).
This kernel does the whole thing per (batch row, centroid tile) in VMEM:

- distances via one MXU matmul (centroid tile @ pointsᵀ),
- the reference's "K lowest in-ball indices" selection (pointnet2_utils.py:
  70-90 sort-semantics) as K iterations of a masked lane-min — Mosaic has no
  top_k/sort, but a min-reduction over an index-valued key vector IS the
  argmin, and K is small (16-128),
- gathers as one-hot matmuls on the MXU (no per-element dynamic indexing),
- pad-with-first-in-ball and centroid subtraction fused in.

Multi-scale grouping (PointNetSetAbstractionMsg, pointnet2_utils.py:176-223)
re-queries the SAME centroids at L radii. ``ball_group_multi_pallas`` fuses
the scales: ONE distance matmul per (row, centroid-tile) program serves every
radius — the per-scale selection loops just re-threshold the resident [T, N]
distance tile — and the outputs land in one [B, S, ΣK, C] tensor (scale l at
K-offset ``sum(K[:l])``). The reference recomputes the full distance matrix
per scale (:203-219); the round-1 kernel did too, costing ~L× redundant
MXU + HBM traffic per MSG layer.

HBM traffic: one read of points/features/centroids, one write of the
[B, S, ΣK, C] output. Numerics golden-tested against ops.sample_and_group.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ball_group_kernel(
    pts_ref,        # [1, N, C]  point channels (+feature channels)
    cent_ref,       # [1, T, P]  centroid tile (P = coord/point channels)
    out_ref,        # [1, 1, ΣK, T, C] — K leading so the dynamic-k store hits
    #                 a non-tiled dimension (Mosaic constraint)
    idx_ref,        # [1, 1, ΣK, T] int32 — selected (post-pad) indices; T in
    #                 lanes so the block carries no 128x lane padding
    sel_ref,        # [T, N] f32 scratch: 1.0 where already selected
    first_ref,      # [T, N] f32 scratch: one-hot of slot 0 (pad source)
    fidx_ref,       # [T, 1] i32 scratch: slot-0 index
    *,
    radii: tuple[float, ...],
    ks: tuple[int, ...],
):
    N, C = pts_ref.shape[1], pts_ref.shape[2]
    T, P = cent_ref.shape[1], cent_ref.shape[2]

    pts = pts_ref[0]                                          # [N, C]
    xyz = pts[:, :P]                                          # [N, P] point chans
    cent = cent_ref[0]                                        # [T, P]

    # squared distances [T, N] — inner product on the MXU, computed ONCE and
    # shared by every radius scale. HIGHEST precision: the default bf16
    # passes truncate coordinates, flipping in-ball membership at the radius
    # boundary vs the XLA path
    inner = jnp.dot(cent, xyz.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = (
        jnp.sum(cent * cent, axis=-1, keepdims=True)
        - 2.0 * inner
        + jnp.sum(xyz * xyz, axis=-1)[None, :]
    )

    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    sentinel = jnp.int32(N)
    # centroid zero-padded to C channels: subtracting it centers the point
    # channels (ALL of them — reference semantics, pointnet2_utils.py:110
    # with (3+num_category)-channel pose inputs) and leaves features alone
    cent_pad = jnp.pad(cent, ((0, 0), (0, C - P))) if C > P else cent

    k_offset = 0
    for radius, K in zip(radii, ks):                          # static scales
        in_ball = d2 <= radius * radius                       # [T, N]

        # loop state lives in VMEM scratch (Mosaic cannot legalize scf.for
        # with large vector iter_args); reset per scale
        sel_ref[...] = jnp.zeros((T, N), jnp.float32)
        first_ref[...] = jnp.zeros((T, N), jnp.float32)
        fidx_ref[...] = jnp.zeros((T, 1), jnp.int32)

        def body(k, _, in_ball=in_ball, k_offset=k_offset):
            keys = jnp.where(in_ball & (sel_ref[...] == 0.0), lane_idx, sentinel)
            cur = jnp.min(keys, axis=-1, keepdims=True)       # [T, 1] lowest unused
            onehot = (lane_idx == cur).astype(jnp.float32)    # all-zero if empty
            # pad-with-first semantics: empty slot -> duplicate slot 0's point
            empty = cur == sentinel                           # [T, 1]
            use = jnp.where(empty, first_ref[...], onehot)
            gathered = jnp.dot(use, pts, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)  # [T, C]
            out_ref[0, 0, k_offset + k] = gathered - cent_pad

            @pl.when(k == 0)
            def _():
                first_ref[...] = use
                fidx_ref[...] = cur

            idx_ref[0, 0, k_offset + k] = jnp.where(
                empty, fidx_ref[...], cur
            ).reshape(T)                                      # used idx (VJP)
            sel_ref[...] = jnp.maximum(sel_ref[...], onehot)
            return 0

        jax.lax.fori_loop(0, K, body, 0)
        k_offset += K


def _pick_tile(N: int, C: int, S: int, K: int, max_tile: int) -> int:
    """Largest divisor T of S (≤ max_tile) whose per-program working set fits
    the scoped-VMEM budget (~16 MB/core on v5e; we target 12 MB to leave room
    for Mosaic temporaries). K is the TOTAL selection count (ΣK over scales).
    Accounts for Mosaic tiling pads: last dim → 128 lanes, second-to-last →
    8 sublanes, and double-buffered grid blocks."""
    budget = int(os.environ.get("PLPE_BALLGROUP_VMEM_BUDGET", 12 * 2**20))
    up = lambda x, m: -(-x // m) * m  # noqa: E731
    Cp, Np = up(C, 128), up(N, 128)
    t = min(max_tile, S)
    while t > 8:
        if S % t == 0:
            Tp = up(t, 8)
            blocks = 2 * 4 * (         # double-buffered f32 grid blocks
                K * Tp * Cp            # out [ΣK, T, C]
                + K * up(t, 128)       # idx [ΣK, T]
                + up(N, 8) * Cp        # pts [N, C]
                + Tp * 128             # centroid tile [T, P]
            )
            scratch = 4 * (2 * Tp * Np + Tp * 128)       # sel/first/fidx
            work = 4 * 4 * Tp * Np                       # d2/keys/onehot temps
            if blocks + scratch + work <= budget:
                return t
        t //= 2
    return t


@functools.partial(
    jax.jit, static_argnames=("radii", "ks", "tile", "interpret")
)
def _ball_group_raw(points, centroids, *, radii, ks, tile, interpret):
    B, N, C = points.shape
    _, S, P = centroids.shape
    K = sum(ks)
    T = _pick_tile(N, C, S, K, tile)
    assert S % T == 0, (S, T)

    out, idx = pl.pallas_call(
        functools.partial(_ball_group_kernel, radii=radii, ks=ks),
        grid=(B, S // T),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, P), lambda b, s: (b, s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, K, T, C), lambda b, s: (b, s, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, K, T), lambda b, s: (b, s, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, S // T, K, T, C), jnp.float32),
            jax.ShapeDtypeStruct((B, S // T, K, T), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((T, N), jnp.float32),
            pltpu.VMEM((T, N), jnp.float32),
            pltpu.VMEM((T, 1), jnp.int32),
        ],
        interpret=interpret,
    )(points.astype(jnp.float32), centroids.astype(jnp.float32))
    # [B, S/T, K, T, *] -> [B, S, K, *]
    out = jnp.swapaxes(out, 2, 3).reshape(B, S, K, C)
    idx = jnp.swapaxes(idx, 2, 3).reshape(B, S, K)
    return out, idx


def _multi_fwd(points, centroids, radii, ks, tile, interpret):
    out, idx = _ball_group_raw(
        points, centroids, radii=radii, ks=ks, tile=tile, interpret=interpret
    )
    # residuals must be jax types: carry the input arrays for shapes/dtypes
    # (both alive anyway as operands of the forward)
    return out, (idx, points, centroids)


def _multi_bwd(radii, ks, tile, interpret, res, g):
    idx, points, centroids = res
    B = idx.shape[0]
    P = centroids.shape[-1]
    # d points: scatter-add of the cotangent at each selected index
    batch = jnp.arange(B)[:, None, None]
    dpts = jnp.zeros_like(points).at[batch, idx, :].add(g.astype(points.dtype))
    # d centroids: the -cent_pad term -> minus the summed point-channel grads
    dcent = -jnp.sum(g[..., :P], axis=2).astype(centroids.dtype)
    return dpts, dcent


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def ball_group_multi_pallas(
    points: jax.Array,
    centroids: jax.Array,
    radii: tuple[float, ...],
    ks: tuple[int, ...],
    tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused MULTI-SCALE grouped neighborhoods (differentiable).

    One Pallas program per (batch row, centroid tile) computes the distance
    matmul once and selects every radius scale from it — the MSG fusion of
    SURVEY §7.7 (reference recomputes distances per scale,
    pointnet2_utils.py:203-219).

    Args:
      points: [B, N, C] clouds; channels 0:P are coordinates (+ spliced
        one-hot), P: are features carried along (pre-concatenated).
      centroids: [B, S, P] query points.
      radii: per-scale ball radii (static tuple).
      ks: per-scale neighbor counts K_l (static tuple).
      tile: max centroid tile per grid program.

    Returns:
      [B, S, ΣK, C]: scale l occupies K-slots ``sum(ks[:l]) : sum(ks[:l+1])``;
      channels 0:P centered on the centroid, features raw.

    The custom VJP scatter-adds output cotangents back to points (gather
    transpose) and sums the coordinate cotangents into centroids, exactly
    the gradient of the XLA gather path.
    """
    out, _ = _ball_group_raw(
        points, centroids, radii=radii, ks=ks, tile=tile, interpret=interpret
    )
    return out


ball_group_multi_pallas.defvjp(_multi_fwd, _multi_bwd)


def ball_group_pallas(
    points: jax.Array,
    centroids: jax.Array,
    radius: float,
    num_neighbors: int,
    tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Single-scale fused grouping: [B, S, K, C], centered on centroids.

    Thin wrapper over ``ball_group_multi_pallas`` with one scale — SSG layers
    (pointnet2_utils.py:143-174) and the golden tests use this entry point.
    """
    return ball_group_multi_pallas(
        points, centroids, (float(radius),), (int(num_neighbors),), tile, interpret
    )
