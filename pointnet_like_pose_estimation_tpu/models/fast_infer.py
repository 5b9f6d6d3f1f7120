"""Serving-path executor: the flagship classifiers rebuilt on the fused
set-abstraction kernel (kernels/fused_sa.py).

``model.apply(train=False)`` materializes every [B, S, K, C] grouped tensor
in HBM; eval-mode BatchNorm is affine, so the whole SA layer folds into
three matmuls that run per centroid tile in VMEM. This module extracts a
trained model's variables, folds BN into the Dense weights, and assembles a
jittable forward that matches ``model.apply`` numerically:

    fwd = build_pn2_ssg_infer(variables)          # or build_pn2_msg_infer
    log_probs, pred = fwd(points)                 # [B, N, 3] -> ([B, C], [B])

FPS + centroid gather stay on their existing kernels; SA3 (group_all) and
the FC head are plain GEMMs XLA already runs well. Inference-only by
construction (folded weights hold no BN state to update).

Parity: pointnet2_cls_ssg.py:22-38 / pointnet2_cls_msg.py:22-38 eval path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pointnet_like_pose_estimation_tpu.kernels.fused_sa import fused_sa_infer
from pointnet_like_pose_estimation_tpu.ops import (
    farthest_point_sample,
    index_points,
)


def fold_dense_bn(dense: dict, bn: dict, stats: dict, eps: float = 1e-5):
    """Fold eval-mode BatchNorm into the preceding Dense: y = z*g/s + (b_bn
    - mu*g/s) with z = xW + b composes to W' = W*(g/s), b' = b*(g/s) + b_bn
    - mu*(g/s)."""
    g_over_s = bn["scale"] / jnp.sqrt(stats["var"] + eps)
    w = dense["kernel"] * g_over_s[None, :]
    b = dense["bias"] * g_over_s + bn["bias"] - stats["mean"] * g_over_s
    return w, b


def _fold_mlp(params: dict, stats: dict, n_layers: int):
    """Folded (W, b) pairs for a PointwiseMLP subtree."""
    out = []
    for i in range(n_layers):
        w, b = fold_dense_bn(
            params[f"dense_{i}"], params[f"bn_{i}"], stats[f"bn_{i}"]
        )
        out += [w, b]
    return out


def _permute_first_w(weights: list, d_feat: int):
    """Reorder layer-1 W rows from the MSG input order [feats(D), coords(3)]
    to the kernel's [coords(3), feats(D)] layout."""
    w = weights[0]
    weights[0] = jnp.concatenate([w[d_feat:], w[:d_feat]], axis=0)
    return weights


def _head_logits(g, params, stats):
    """DenseHead style=cls_v2 eval: dropout is identity, BN affine."""
    x = g
    for i in range(2):
        w, b = fold_dense_bn(
            params[f"fc_{i}"], params[f"bn_{i}"], stats[f"bn_{i}"]
        )
        x = jnp.maximum(x @ w + b, 0.0)
    last = params["fc_2"]
    return x @ last["kernel"] + last["bias"]


def _group_all_feature(p, f, mlp_params, mlp_stats, n_layers):
    """SA3 (group_all): concat [coords, feats] over the whole cloud, MLP,
    max — plain GEMMs (pointnet2_utils.py:122-141)."""
    x = jnp.concatenate([p, f], axis=-1) if f is not None else p
    for i, (w, b) in enumerate(
        zip(*[iter(_fold_mlp(mlp_params, mlp_stats, n_layers))] * 2)
    ):
        x = jnp.maximum(x @ w + b, 0.0)
    return jnp.max(x, axis=-2)


def build_pn2_ssg_infer(variables: dict, interpret: bool = False):
    """Fused-kernel eval forward for pointnet2_cls_ssg."""
    params, stats = variables["params"], variables["batch_stats"]
    sa1_w = tuple(_fold_mlp(params["sa1"]["mlp"], stats["sa1"]["mlp"], 3))
    sa2_w = tuple(_fold_mlp(params["sa2"]["mlp"], stats["sa2"]["mlp"], 3))

    @jax.jit
    def fwd(points):
        cent1 = index_points(points, farthest_point_sample(points, 512))
        f1 = fused_sa_infer(
            points, cent1, sa1_w, (0.2,), (32,), ((64, 64, 128),),
            interpret=interpret,
        )
        pf1 = jnp.concatenate([cent1, f1], axis=-1)           # [B, 512, 131]
        cent2 = index_points(cent1, farthest_point_sample(cent1, 128))
        f2 = fused_sa_infer(
            pf1, cent2, sa2_w, (0.4,), (64,), ((128, 128, 256),),
            interpret=interpret,
        )
        g = _group_all_feature(
            cent2, f2, params["sa3"]["mlp"], stats["sa3"]["mlp"], 3
        )
        logits = _head_logits(g, params["head"], stats["head"])
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs, jnp.argmax(log_probs, axis=-1)

    return fwd


_MSG_CFG = {
    "sa1": dict(S=512, ks=(16, 32, 128), radii=(0.1, 0.2, 0.4),
                mlps=((32, 32, 64), (64, 64, 128), (64, 96, 128))),
    "sa2": dict(S=128, ks=(32, 64, 128), radii=(0.2, 0.4, 0.8),
                mlps=((64, 64, 128), (128, 128, 256), (128, 128, 256))),
}


def build_pn2_msg_infer(variables: dict, interpret: bool = False):
    """Fused-kernel eval forward for pointnet2_cls_msg (one fused call per
    SA level serves every radius scale)."""
    params, stats = variables["params"], variables["batch_stats"]

    def fold_msg(name, d_feat):
        cfg = _MSG_CFG[name]
        weights = []
        for i, widths in enumerate(cfg["mlps"]):
            ws = _fold_mlp(
                params[name][f"mlp_{i}"], stats[name][f"mlp_{i}"], len(widths)
            )
            if d_feat:
                ws = _permute_first_w(ws, d_feat)
            weights += ws
        return tuple(weights)

    sa1_w = fold_msg("sa1", 0)
    sa2_w = fold_msg("sa2", 64 + 128 + 128)

    @jax.jit
    def fwd(points):
        c1 = _MSG_CFG["sa1"]
        cent1 = index_points(points, farthest_point_sample(points, c1["S"]))
        f1 = fused_sa_infer(
            points, cent1, sa1_w, c1["radii"], c1["ks"], c1["mlps"],
            interpret=interpret,
        )
        c2 = _MSG_CFG["sa2"]
        pf1 = jnp.concatenate([cent1, f1], axis=-1)
        cent2 = index_points(cent1, farthest_point_sample(cent1, c2["S"]))
        f2 = fused_sa_infer(
            pf1, cent2, sa2_w, c2["radii"], c2["ks"], c2["mlps"],
            interpret=interpret,
        )
        g = _group_all_feature(
            cent2, f2, params["sa3"]["mlp"], stats["sa3"]["mlp"], 3
        )
        logits = _head_logits(g, params["head"], stats["head"])
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        return log_probs, jnp.argmax(log_probs, axis=-1)

    return fwd
