"""Geometric primitives on batched point clouds.

All functions are pure, jittable, and channels-last (``[B, N, C]``): the
point-count axis maps onto TPU sublanes and the channel axis onto lanes, so
pairwise distances and point-wise MLPs lower straight onto the MXU.

Parity: square_distance / index_points follow
/root/reference/model/pointnet2_utils.py:5-45; normalize_cloud follows
provider.py:5-21 (per-cloud centroid subtract + unit-sphere scale);
euler_rotation_matrix follows the X·Y·Z euler convention of
provider.py:66-92 and data_build/Cube.py:59-72.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared L2 distance.

    ``dist[b, n, m] = ||src[b, n] - dst[b, m]||^2`` computed as
    ``-2 src·dstᵀ + ||src||² + ||dst||²`` so the inner product rides the MXU
    (reference: pointnet2_utils.py:5-26).

    Args:
      src: ``[..., N, C]`` source points.
      dst: ``[..., M, C]`` target points.

    Returns:
      ``[..., N, M]`` squared distances.
    """
    # One fused dot_general; the norm terms are cheap rank-1 updates XLA fuses
    # into the matmul epilogue. HIGHEST precision: C is tiny (3), so the MXU
    # cost is negligible, and bf16 passes would corrupt neighbor selection.
    inner = jnp.matmul(
        src,
        jnp.swapaxes(dst, -1, -2),
        preferred_element_type=src.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    s2 = jnp.sum(src * src, axis=-1, keepdims=True)          # [..., N, 1]
    d2 = jnp.sum(dst * dst, axis=-1, keepdims=True)          # [..., M, 1]
    return -2.0 * inner + s2 + jnp.swapaxes(d2, -1, -2)


def _gather(points: jax.Array, idx: jax.Array) -> jax.Array:
    B, N, C = points.shape
    out_shape = idx.shape + (C,)
    flat_idx = idx.reshape(B, -1)                             # [B, S*K]
    got = jnp.take_along_axis(points, flat_idx[..., None], axis=1)
    return got.reshape(out_shape)


@jax.custom_vjp
def _gather_matmul_vjp(points: jax.Array, idx: jax.Array) -> jax.Array:
    return _gather(points, idx)


def _gather_fwd(points, idx):
    return _gather(points, idx), (idx, points.shape)


def _gather_bwd(res, g):
    """Gather transpose as a one-hot MXU matmul instead of XLA's scatter-add.

    TPU scatters with duplicate indices serialize; the segment-sum
    ``dPoints[b] = onehot(idx)[b]^T @ dOut[b]`` is a dense batched GEMM the
    MXU eats (measured on the FULL train step, log/ab_round4.json — B=24
    SSG 22.9 -> 16.0 ms; the isolated-scatter probe's compile is itself
    pathological, scripts/probe_scatter_bwd.py). The one-hot transient
    ([B, S*K, N] f32) is materialized whole when it fits the budget and
    K-chunked via ``_chunked_segment_sum`` otherwise, so the MXU backward
    applies at every shape; ``PLPE_GATHER_VJP=scatter`` restores the
    native scatter.
    """
    idx, (B, N, C) = res
    flat = idx.reshape(B, -1)                                 # [B, SK]
    gf = g.reshape(B, -1, C).astype(jnp.float32)              # [B, SK, C]
    SK = flat.shape[1]
    if B * SK * N * 4 <= _ONEHOT_BUDGET:
        onehot = jax.nn.one_hot(flat, N, dtype=jnp.float32)   # [B, SK, N]
        dpts = jax.lax.dot_general(
            onehot, gf, (((1,), (1,)), ((0,), (0,))),         # contract SK
            preferred_element_type=jnp.float32,
        )                                                     # [B, N, C]
    else:
        dpts = _chunked_segment_sum(flat, gf, B, N, C)
    return dpts.astype(g.dtype), np.zeros(idx.shape, jax.dtypes.float0)


def _chunked_segment_sum(flat, gf, B, N, C):
    """Segment-sum GEMM with a BOUNDED one-hot transient (VERDICT r4 #4).

    Splits the SK axis into chunks sized so the [B, chunk, N] one-hot stays
    within ``PLPE_GATHER_VJP_BUDGET`` bytes, and accumulates the per-chunk
    batched GEMMs under ``lax.scan`` — extending the measured MXU-backward
    win (log/ab_round4.json, 1.43x at SSG B=24) to shapes where the full
    one-hot (B*SK*N*4 bytes) would blow HBM: SSG B=256 and the MSG heads.
    Out-of-range pad indices (== N) one-hot to all-zero rows, so padding the
    tail chunk contributes nothing.
    """
    SK = flat.shape[1]
    nchunks = max(1, -(-(B * SK * N * 4) // int(_ONEHOT_BUDGET)))
    chunk = -(-SK // nchunks)
    chunk = -(-chunk // 8) * 8                                # lane-align
    nchunks = -(-SK // chunk)
    pad = nchunks * chunk - SK
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)), constant_values=N)
        gf = jnp.pad(gf, ((0, 0), (0, pad), (0, 0)))
    flat = flat.reshape(B, nchunks, chunk).transpose(1, 0, 2)       # [nc,B,k]
    gf = gf.reshape(B, nchunks, chunk, C).transpose(1, 0, 2, 3)     # [nc,B,k,C]

    def body(acc, xs):
        f, gg = xs
        oh = jax.nn.one_hot(f, N, dtype=jnp.float32)          # [B, chunk, N]
        d = jax.lax.dot_general(
            oh, gg, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return acc + d, None

    acc, _ = jax.lax.scan(body, jnp.zeros((B, N, C), jnp.float32), (flat, gf))
    return acc


_gather_matmul_vjp.defvjp(_gather_fwd, _gather_bwd)

# gather-backward strategy: "scatter" (XLA native), "matmul" (one-hot
# segment-sum GEMM — single GEMM within the transient budget, K-chunked
# scan-accumulated GEMMs beyond it), or "auto" (matmul; budget in bytes,
# default 1.5 GB, only selects single-vs-chunked).
#
# CAVEAT (forward-mode AD): matmul/auto route index_points through a
# jax.custom_vjp wrapper, so jax.jvp / jax.linearize / hessian-vector
# products through any gather-using model raise at trace time ("custom_vjp
# does not support forward-mode AD"). No in-repo caller uses jvp; if you
# need it, set PLPE_GATHER_VJP=scatter — the escape hatch restores plain
# take_along_axis with XLA's native transpose.
_GATHER_VJP = os.environ.get("PLPE_GATHER_VJP", "auto")
_ONEHOT_BUDGET = float(os.environ.get("PLPE_GATHER_VJP_BUDGET", 1.5e9))


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather: ``out[b, ...s, :] = points[b, idx[b, ...s], :]``.

    Equivalent of pointnet2_utils.py:28-45 but expressed as
    ``take_along_axis`` so XLA emits a single fused gather. The BACKWARD is
    the train step's one scatter-add (docs/PERF.md); under
    ``PLPE_GATHER_VJP=auto|matmul`` it becomes a one-hot segment-sum GEMM
    (measured faster on v5e on the full train step, log/ab_round4.json).

    Args:
      points: ``[B, N, C]``.
      idx: ``[B, S]`` or ``[B, S, K]`` integer indices into the N axis.

    Returns:
      ``[B, S, C]`` or ``[B, S, K, C]``.
    """
    if _GATHER_VJP != "scatter":
        # matmul backward for every shape: single GEMM within the one-hot
        # budget, K-chunked scan beyond it (A/B'd at SSG b256 + MSG b24,
        # log/ab_round5.json)
        return _gather_matmul_vjp(points, idx)
    return _gather(points, idx)


def normalize_cloud(points: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Center each cloud at its centroid and scale into the unit sphere.

    Vectorized over the batch (the reference loops per cloud on host numpy,
    provider.py:5-21). Only the first 3 channels are assumed geometric when
    C == 3; callers with rgb channels should slice first.

    Args:
      points: ``[..., N, C]``.

    Returns:
      ``[..., N, C]`` normalized clouds.
    """
    centroid = jnp.mean(points, axis=-2, keepdims=True)
    centered = points - centroid
    scale = jnp.max(
        jnp.sqrt(jnp.sum(centered * centered, axis=-1, keepdims=True)),
        axis=-2,
        keepdims=True,
    )
    return centered / (scale + eps)


def euler_rotation_matrix(angles_rad: jax.Array) -> jax.Array:
    """X·Y·Z Euler rotation matrix ``R = Rx @ Ry @ Rz``.

    Matches provider.py:66-92 / data_build/Cube.py:59-72 (degrees converted by
    the caller; this takes radians). Batched over leading dims.

    Args:
      angles_rad: ``[..., 3]`` (phi/x, theta/y, psi/z) in radians.

    Returns:
      ``[..., 3, 3]`` rotation matrices.
    """
    a, b, c = angles_rad[..., 0], angles_rad[..., 1], angles_rad[..., 2]
    ca, sa = jnp.cos(a), jnp.sin(a)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    z = jnp.zeros_like(a)
    o = jnp.ones_like(a)
    rx = jnp.stack(
        [jnp.stack([o, z, z], -1), jnp.stack([z, ca, -sa], -1), jnp.stack([z, sa, ca], -1)],
        axis=-2,
    )
    ry = jnp.stack(
        [jnp.stack([cb, z, sb], -1), jnp.stack([z, o, z], -1), jnp.stack([-sb, z, cb], -1)],
        axis=-2,
    )
    rz = jnp.stack(
        [jnp.stack([cc, -sc, z], -1), jnp.stack([sc, cc, z], -1), jnp.stack([z, z, o], -1)],
        axis=-2,
    )
    return rx @ ry @ rz


def rotate_euler(points: jax.Array, angles_rad: jax.Array) -> jax.Array:
    """Rotate clouds by per-cloud X·Y·Z Euler angles.

    ``points @ R.T`` as in provider.py:89-92 / Cube.py:72.

    Args:
      points: ``[..., N, 3]``.
      angles_rad: ``[..., 3]`` broadcastable to the leading dims of points.

    Returns:
      rotated ``[..., N, 3]``.
    """
    R = euler_rotation_matrix(angles_rad)
    return jnp.einsum("...nc,...dc->...nd", points, R)
