"""Fused ball-query + gather + center Pallas kernel.

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

HBM traffic: one read of points/features/centroids, one write of the
[B, S, K, C] output. Numerics golden-tested against ops.sample_and_group.
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
    out_ref,        # [1, 1, K, T, C] — K leading so the dynamic-k store hits
    #                 a non-tiled dimension (Mosaic constraint)
    idx_ref,        # [1, 1, K, T] int32 — selected (post-pad) indices; T in
    #                 lanes so the block carries no 128x lane padding
    sel_ref,        # [T, N] f32 scratch: 1.0 where already selected
    first_ref,      # [T, N] f32 scratch: one-hot of slot 0 (pad source)
    fidx_ref,       # [T, 1] i32 scratch: slot-0 index
    *,
    radius: float,
    num_neighbors: int,
):
    N, C = pts_ref.shape[1], pts_ref.shape[2]
    T, P = cent_ref.shape[1], cent_ref.shape[2]
    K = num_neighbors

    pts = pts_ref[0]                                          # [N, C]
    xyz = pts[:, :P]                                          # [N, P] point chans
    cent = cent_ref[0]                                        # [T, P]

    # squared distances [T, N] — inner product on the MXU. HIGHEST precision:
    # the default bf16 passes truncate coordinates, flipping in-ball
    # membership at the radius boundary vs the XLA path
    inner = jnp.dot(cent, xyz.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = (
        jnp.sum(cent * cent, axis=-1, keepdims=True)
        - 2.0 * inner
        + jnp.sum(xyz * xyz, axis=-1)[None, :]
    )
    in_ball = d2 <= radius * radius                           # [T, N]

    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    sentinel = jnp.int32(N)
    # centroid zero-padded to C channels: subtracting it centers the point
    # channels (ALL of them — reference semantics, pointnet2_utils.py:110
    # with (3+num_category)-channel pose inputs) and leaves features alone
    cent_pad = jnp.pad(cent, ((0, 0), (0, C - P))) if C > P else cent

    # loop state lives in VMEM scratch (Mosaic cannot legalize scf.for with
    # large vector iter_args)
    sel_ref[...] = jnp.zeros((T, N), jnp.float32)
    first_ref[...] = jnp.zeros((T, N), jnp.float32)
    fidx_ref[...] = jnp.zeros((T, 1), jnp.int32)

    def body(k, _):
        keys = jnp.where(in_ball & (sel_ref[...] == 0.0), lane_idx, sentinel)
        cur = jnp.min(keys, axis=-1, keepdims=True)           # [T, 1] lowest unused
        onehot = (lane_idx == cur).astype(jnp.float32)        # all-zero if empty
        # pad-with-first semantics: empty slot -> duplicate slot 0's point
        empty = cur == sentinel                               # [T, 1]
        use = jnp.where(empty, first_ref[...], onehot)
        gathered = jnp.dot(use, pts, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # [T, C]
        out_ref[0, 0, k] = gathered - cent_pad

        @pl.when(k == 0)
        def _():
            first_ref[...] = use
            fidx_ref[...] = cur

        idx_ref[0, 0, k] = jnp.where(empty, fidx_ref[...], cur).reshape(T)  # used idx (VJP)
        sel_ref[...] = jnp.maximum(sel_ref[...], onehot)
        return 0

    jax.lax.fori_loop(0, K, body, 0)


def _pick_tile(N: int, C: int, S: int, K: int, max_tile: int) -> int:
    """Largest divisor T of S (≤ max_tile) whose per-program working set fits
    the scoped-VMEM budget (~16 MB/core on v5e; we target 12 MB to leave room
    for Mosaic temporaries). Accounts for Mosaic tiling pads: last dim → 128
    lanes, second-to-last → 8 sublanes, and double-buffered grid blocks."""
    budget = int(os.environ.get("PLPE_BALLGROUP_VMEM_BUDGET", 12 * 2**20))
    up = lambda x, m: -(-x // m) * m  # noqa: E731
    Cp, Np = up(C, 128), up(N, 128)
    t = min(max_tile, S)
    while t > 8:
        if S % t == 0:
            Tp = up(t, 8)
            blocks = 2 * 4 * (         # double-buffered f32 grid blocks
                K * Tp * Cp            # out [K, T, C]
                + K * up(t, 128)       # idx [K, T]
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
    jax.jit, static_argnames=("radius", "num_neighbors", "tile", "interpret")
)
def _ball_group_raw(points, centroids, *, radius, num_neighbors, tile, interpret):
    B, N, C = points.shape
    _, S, P = centroids.shape
    K = num_neighbors
    T = _pick_tile(N, C, S, K, tile)
    assert S % T == 0, (S, T)

    out, idx = pl.pallas_call(
        functools.partial(
            _ball_group_kernel, radius=radius, num_neighbors=num_neighbors
        ),
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


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def ball_group_pallas(
    points: jax.Array,
    centroids: jax.Array,
    radius: float,
    num_neighbors: int,
    tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused grouped neighborhoods, centered on centroids (differentiable).

    Args:
      points: [B, N, C] clouds; channels 0:3 are coordinates, 3: are
        features carried along (pre-concatenated).
      centroids: [B, S, P] query points, P = number of point channels used
        for both the distance test and the centering (3 for raw clouds,
        3+num_category for spliced pose inputs — reference semantics).
      radius: ball radius.
      num_neighbors: K.
      tile: centroid tile per grid program.

    Returns:
      [B, S, K, C]: channels 0:3 centered on the centroid, features raw —
      the reference's sample_and_group output layout with concat order
      [centered_coords, features].

    The custom VJP scatter-adds output cotangents back to points (gather
    transpose) and sums the coordinate cotangents into centroids, exactly
    the gradient of the XLA gather path.
    """
    out, _ = _ball_group_raw(
        points, centroids, radius=radius, num_neighbors=num_neighbors,
        tile=tile, interpret=interpret,
    )
    return out


def _ball_group_fwd(points, centroids, radius, num_neighbors, tile, interpret):
    out, idx = _ball_group_raw(
        points, centroids, radius=radius, num_neighbors=num_neighbors,
        tile=tile, interpret=interpret,
    )
    # residuals must be jax types: carry the input arrays for shapes/dtypes
    # (both alive anyway as operands of the forward)
    return out, (idx, points, centroids)


def _ball_group_bwd(radius, num_neighbors, tile, interpret, res, g):
    idx, points, centroids = res
    B = idx.shape[0]
    P = centroids.shape[-1]
    # d points: scatter-add of the cotangent at each selected index
    batch = jnp.arange(B)[:, None, None]
    dpts = jnp.zeros_like(points).at[batch, idx, :].add(g.astype(points.dtype))
    # d centroids: the -cent_pad term -> minus the summed point-channel grads
    dcent = -jnp.sum(g[..., :P], axis=2).astype(centroids.dtype)
    return dpts, dcent


ball_group_pallas.defvjp(_ball_group_fwd, _ball_group_bwd)
