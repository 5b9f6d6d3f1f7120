"""Fused set-abstraction INFERENCE kernel: ball-select + gather + MLP + max
in one Pallas program — grouped tensors never touch HBM.

The XLA eval path materializes every [B, S, K, C] grouped tensor through
3 conv+BN+ReLU stages (docs/PERF.md: the step is HBM-roofline-bound on
exactly these tensors). In eval mode BatchNorm is a per-channel affine, so
the whole SA layer folds into three matmuls — small enough to run entirely
in VMEM per (batch row, centroid tile):

- distances via one MXU matmul (as kernels/ball_group.py),
- the reference's K-lowest-in-ball selection as masked lane-min iterations,
- the GATHER as a per-k one-hot matmul [T,N]x[N,P] — selection already
  produces the one-hot row mask, and the matmul costs T*N*128 effective
  MXU flops (lanes pad to 128) — cheap next to the MLP it feeds,
- the shared MLP as [K*T, C] GEMMs with BN folded into (W', b')
  (y = z*gamma/sigma + (beta - mu*gamma/sigma) composes into the Dense),
- centering via the affine identity: relu((x-c)@W1) = relu(x@W1 - c@W1c),
  so the gathered slab is never edited in place,
- the group max as a [K, T, C] reduction.

HBM traffic per SA layer drops from O(B*S*K*C) activations (fwd) to one
read of [B,N,P] + one write of [B,S,C_out]. Training still uses the XLA
path (batch-stats BN breaks the per-tile fusion); this kernel is the
serving/eval executor (models/fast_infer.py). Inference-only: integer
selection + folded weights, no VJP — callers hold no gradients.

Parity: pointnet2_utils.py:92-120 + :154-174 semantics (SSG), channel
order [centered coords, features]; MSG callers pre-permute W1 rows
(fast_infer.fold_msg) so the kernel keeps one data layout.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_sa_kernel(
    pts_ref,        # [1, N, P]  coords (first 3) + features
    cent_ref,       # [1, T, 3]  centroid coords
    *refs,          # per-scale, per-layer W [Cin, Cout], b [1, Cout] refs,
    #                 then out_ref [1, T, sum(CL)], then scratch:
    #                 sel [T, N] f32, fidx [T, 1] i32,
    #                 gath [Kmax*T, P] f32, act_a/act_b [Kmax*T, Cmax] f32
    radii: tuple[float, ...],
    ks: tuple[int, ...],
    layer_counts: tuple[int, ...],
    tile: int,
):
    n_w = 2 * sum(layer_counts)
    w_refs, (out_ref,), (sel_ref, fidx_ref, gath_ref, act_a, act_b) = (
        refs[:n_w], refs[n_w : n_w + 1], refs[n_w + 1 :]
    )
    N, P = pts_ref.shape[1], pts_ref.shape[2]
    T = tile

    pts = pts_ref[0]                                          # [N, P]
    cent = cent_ref[0]                                        # [T, 3]
    coords = pts[:, :3]

    inner = jnp.dot(cent, coords.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    d2 = (
        jnp.sum(cent * cent, axis=-1, keepdims=True)
        - 2.0 * inner
        + jnp.sum(coords * coords, axis=-1)[None, :]
    )                                                         # [T, N]

    lane = jax.lax.broadcasted_iota(jnp.int32, (T, N), 1)
    sentinel = jnp.int32(N)

    w_i = 0
    c_off = 0
    for s_idx, (radius, K, n_layers) in enumerate(zip(radii, ks, layer_counts)):
        in_ball = d2 <= radius * radius                       # [T, N]
        sel_ref[...] = jnp.zeros((T, N), jnp.float32)
        fidx_ref[...] = jnp.zeros((T, 1), jnp.int32)

        def body(k, _, in_ball=in_ball):
            keys = jnp.where(in_ball & (sel_ref[...] == 0.0), lane, sentinel)
            cur = jnp.min(keys, axis=-1, keepdims=True)       # [T, 1]
            empty = cur == sentinel

            @pl.when(k == 0)
            def _():
                fidx_ref[...] = cur

            cur_eff = jnp.minimum(
                jnp.where(empty, fidx_ref[...], cur), sentinel - 1
            )                                                 # [T, 1]
            onehot = (lane == cur_eff).astype(jnp.float32)    # [T, N]
            g = jnp.dot(onehot, pts, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # [T, P]
            gath_ref[pl.ds(k * T, T), :] = g
            sel_ref[...] = jnp.maximum(
                sel_ref[...], (lane == cur).astype(jnp.float32)
            )
            return 0

        jax.lax.fori_loop(0, K, body, 0)

        # centering correction for layer 1: (x - c) @ W1 = x @ W1 - c @ W1c
        w1 = w_refs[w_i][...]                                 # [P, C1]
        b1 = w_refs[w_i + 1][...]                             # [1, C1]
        corr = jnp.dot(cent, w1[:3, :],
                       preferred_element_type=jnp.float32)    # [T, C1]
        x = gath_ref[pl.ds(0, K * T), :]                      # [K*T, P]
        h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
        h = h - jnp.broadcast_to(corr[None], (K, T, w1.shape[1])).reshape(
            K * T, w1.shape[1]
        )
        h = jnp.maximum(h + b1, 0.0)
        act_a[pl.ds(0, K * T), pl.ds(0, h.shape[1])] = h
        w_i += 2
        cur_c = h.shape[1]
        bufs = (act_a, act_b)
        for li in range(1, n_layers):
            w = w_refs[w_i][...]                              # [C_in, C_out]
            b = w_refs[w_i + 1][...]
            src = bufs[(li - 1) % 2]
            dst = bufs[li % 2]
            h = jnp.dot(src[pl.ds(0, K * T), pl.ds(0, cur_c)], w,
                        preferred_element_type=jnp.float32)
            h = jnp.maximum(h + b, 0.0)
            dst[pl.ds(0, K * T), pl.ds(0, h.shape[1])] = h
            cur_c = h.shape[1]
            w_i += 2
        final = bufs[(n_layers - 1) % 2]
        out = jnp.max(
            final[pl.ds(0, K * T), pl.ds(0, cur_c)].reshape(K, T, cur_c),
            axis=0,
        )                                                     # [T, CL]
        out_ref[0, :, pl.ds(c_off, cur_c)] = out
        c_off += cur_c


def _pick_tile(N, P, S, ks, widths, budget=None):
    """Largest divisor tile T (multiple of 8) whose buffers fit VMEM."""
    budget = budget or int(os.environ.get("PLPE_FUSEDSA_VMEM_BUDGET",
                                          11 * 2**20))
    up = lambda x, m: -(-x // m) * m  # noqa: E731
    Np, Pp = up(N, 128), up(P, 128)
    Kmax, Cmax = max(ks), up(max(widths), 128)
    if S % 8 != 0:
        raise ValueError(
            f"fused_sa_infer needs a centroid count divisible by 8 "
            f"(sublane tiling); got S={S}. Pad the centroid set."
        )
    t = min(128, S)
    while t >= 8:
        if S % t == 0 and t % 8 == 0:
            fixed = 4 * (up(N, 8) * Pp * 2 + t * Np)          # pts blocks + d2ish
            scr = 4 * (t * Np + t * 128                       # sel, fidx
                       + Kmax * t * Pp                        # gath
                       + 2 * Kmax * t * Cmax)                 # act ping-pong
            if fixed + scr <= budget:
                return t
        t -= 8
    raise ValueError(
        f"fused_sa_infer: no centroid tile fits the VMEM budget "
        f"({budget} bytes) for N={N}, P={P}, S={S}, Kmax={Kmax}, "
        f"Cmax={Cmax}; raise PLPE_FUSEDSA_VMEM_BUDGET or shrink the layer."
    )


@functools.partial(
    jax.jit,
    static_argnames=("radii", "ks", "layer_widths", "interpret"),
)
def fused_sa_infer(
    ptsfeat: jax.Array,
    centroids: jax.Array,
    weights: tuple,
    radii: tuple[float, ...],
    ks: tuple[int, ...],
    layer_widths: tuple[tuple[int, ...], ...],
    interpret: bool = False,
) -> jax.Array:
    """Fused eval-mode set abstraction.

    Args:
      ptsfeat: [B, N, 3+D] coords-first point channels.
      centroids: [B, S, 3] query centroids (from FPS + gather).
      weights: flat tuple, per scale then per layer: (W [Cin, Cout],
        b [Cout]) with BN folded (fast_infer.fold_dense_bn). Layer-1 W rows
        must be ordered [coords, features].
      radii/ks: per-scale ball radius and neighbor count (static).
      layer_widths: per-scale tuple of output widths (static).

    Returns:
      [B, S, sum(last widths)] max-pooled features.
    """
    B, N, P = ptsfeat.shape
    _, S, _ = centroids.shape
    widths = [w for ws in layer_widths for w in ws]
    T = _pick_tile(N, P, S, ks, widths)
    assert S % T == 0, (S, T)
    Kmax, Cmax = max(ks), max(widths)
    CL = sum(ws[-1] for ws in layer_widths)
    layer_counts = tuple(len(ws) for ws in layer_widths)

    w_specs, w_args = [], []
    for w in weights:
        arr = jnp.asarray(w, jnp.float32)
        if arr.ndim == 1:
            arr = arr[None, :]                                # b -> [1, C]
        w_specs.append(
            # bind the rank at lambda creation (nd=...) — a bare arr.ndim
            # would late-bind the loop variable and index every weight with
            # the LAST array's rank if the 2-D coercion above ever changed
            pl.BlockSpec(arr.shape, lambda b, s, nd=arr.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
        )
        w_args.append(arr)

    out = pl.pallas_call(
        functools.partial(
            _fused_sa_kernel, radii=radii, ks=ks,
            layer_counts=layer_counts, tile=T,
        ),
        grid=(B, S // T),
        in_specs=[
            pl.BlockSpec((1, N, P), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 3), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((1, T, CL), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, CL), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T, N), jnp.float32),
            pltpu.VMEM((T, 1), jnp.int32),
            pltpu.VMEM((Kmax * T, P), jnp.float32),
            pltpu.VMEM((Kmax * T, Cmax), jnp.float32),
            pltpu.VMEM((Kmax * T, Cmax), jnp.float32),
        ],
        interpret=interpret,
    )(ptsfeat.astype(jnp.float32), centroids.astype(jnp.float32), *w_args)
    return out
