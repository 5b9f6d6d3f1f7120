"""PointNet-like pose heads: rotation, sign, translation, width.

One vanilla template + one SSG template + one MSG template cover all 11
reference pose models (the reference's model/pose.py:7-105 already proves
they are one family). Inputs are channels-last spliced clouds
``[B, N, 3 + num_classes]`` (one-hot class vector on the channel axis,
provider.py:166-180); SSG/MSG backbones carry the full spliced channels
through the SA hierarchy exactly like the reference does (the one-hot
channels cancel under centroid subtraction in level-1 grouping — a faithful
reproduction of rotation_ssg.py:9-13 feeding (3+C)-channel "points").

Parity map:
- VanillaHead(out=3)                  -> model/rotation.py:7-49 (the TNetkd
  computed at :37 is dead in the reference — never multiplied in — and is
  reproduced only under ``compat_dead_tnet=True``)
- VanillaHead(out=1, sigmoid_sign)    -> model/sign.py:6-44
- VanillaHead(out=3, mean_residual)   -> model/translation.py:6-50
- VanillaHead(out=1)                  -> model/width.py:7-44 (optionally
  6-channel xyz+normal input via the spliced channel count)
- SSGHead(levels=3, out=3)            -> model/rotation_ssg.py:5-38
- SSGHead(levels=2, out=1, sign)      -> model/sign_ssg.py:5-37
- SSGHead(levels=2, out=3, mean)      -> model/translation_ssg.py:5-44
- MSGHead(out=3)                      -> model/rotation_msg.py:5-38
- MSGHead(levels=2, out=1, sign)      -> model/sign_msg.py:5-37
- MSGHead(levels=2, out=3, mean)      -> model/translation_msg.py:5-44
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pointnet_like_pose_estimation_tpu.nn.bn_context import bn_axis_name

from pointnet_like_pose_estimation_tpu.nn import (
    DenseHead,
    PointwiseMLP,
    SetAbstraction,
    SetAbstractionMSG,
    TNet,
    batch_norm_f32,
)

Dtype = Any


class MeanMLP(nn.Module):
    """3 -> 6 -> 3 residual on the cloud centroid (translation.py:27-37)."""

    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, mean, *, train: bool):
        h = nn.Dense(6, dtype=self.dtype, name="fc1")(mean)
        h = batch_norm_f32(h, train=train, name="bn1")
        h = nn.relu(h)
        return nn.Dense(3, dtype=self.dtype, name="fc2")(h)


def _sign_out(x):
    """sigmoid prob + hard sign in {-1, +1} (sign.py:42-44)."""
    prob = nn.sigmoid(x.astype(jnp.float32))
    return prob, jnp.sign(prob - 0.5)


class VanillaHead(nn.Module):
    """Shared-MLP tower + global max + FC head (the rotation.py template).

    Attributes:
      out_dim: final output width (3 rotation/translation, 1 sign/width).
      mlp: shared-MLP widths (reference default [64,64,64,128,1024]).
      fc: FC widths incl. output (reference default [512,256,out]).
      sigmoid_sign: return (sigmoid prob, hard sign) like sign.py.
      mean_residual: add MeanMLP(mean) to the output like translation.py
        (callers must pass ``mean``).
      compat_dead_tnet: instantiate (and ignore) the TNetkd after conv layer
        2 purely for parameter/FLOP parity with rotation.py:37.
    """

    out_dim: int = 3
    mlp: Sequence[int] = (64, 64, 64, 128, 1024)
    fc: Sequence[int] = (512, 256)
    sigmoid_sign: bool = False
    mean_residual: bool = False
    compat_dead_tnet: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, points, mean=None, *, train: bool = False):
        dt = self.dtype
        x = PointwiseMLP(self.mlp[:2], dtype=dt, name="mlp_pre")(points, train=train)
        if self.compat_dead_tnet:
            TNet(k=self.mlp[1], dtype=dt, name="dead_tnet")(x, train=train)
        x = PointwiseMLP(self.mlp[2:], dtype=dt, name="mlp_post")(x, train=train)
        g = jnp.max(x, axis=-2)                               # [B, mlp[-1]]
        out = DenseHead(list(self.fc) + [self.out_dim], style="pose", dtype=dt, name="head")(
            g, train=train
        )
        if self.mean_residual:
            out = out + MeanMLP(dtype=dt, name="mean_mlp")(mean, train=train)
        if self.sigmoid_sign:
            return _sign_out(out)
        return out


class SSGHead(nn.Module):
    """PointNet++ SSG backbone + FC head for pose regression."""

    out_dim: int = 3
    levels: int = 3
    sigmoid_sign: bool = False
    mean_residual: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, points, mean=None, *, train: bool = False):
        dt = self.dtype
        p, f = SetAbstraction(512, 32, 0.2, [64, 64, 128], dtype=dt, name="sa1")(
            points, None, train=train
        )
        if self.levels == 3:
            p, f = SetAbstraction(128, 64, 0.4, [128, 128, 256], dtype=dt, name="sa2")(
                p, f, train=train
            )
        _, f = SetAbstraction(None, None, None, [256, 512, 1024], group_all=True, dtype=dt, name="sa_global")(
            p, f, train=train
        )
        g = f.reshape(f.shape[0], -1)
        out = DenseHead([512, 256, self.out_dim], style="cls_v2", dtype=dt, name="head")(
            g, train=train
        )
        if self.mean_residual:
            out = out + MeanMLP(dtype=dt, name="mean_mlp")(mean, train=train)
        if self.sigmoid_sign:
            return _sign_out(out)
        return out


class MSGHead(nn.Module):
    """PointNet++ MSG backbone + FC head for pose regression."""

    out_dim: int = 3
    levels: int = 3
    sigmoid_sign: bool = False
    mean_residual: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, points, mean=None, *, train: bool = False):
        dt = self.dtype
        p, f = SetAbstractionMSG(
            512, [16, 32, 128], [0.1, 0.2, 0.4],
            [[32, 32, 64], [64, 64, 128], [64, 96, 128]], dtype=dt, name="sa1",
        )(points, None, train=train)
        if self.levels == 3:
            p, f = SetAbstractionMSG(
                128, [32, 64, 128], [0.2, 0.4, 0.8],
                [[64, 64, 128], [128, 128, 256], [128, 128, 256]], dtype=dt, name="sa2",
            )(p, f, train=train)
        _, f = SetAbstraction(None, None, None, [256, 512, 1024], group_all=True, dtype=dt, name="sa_global")(
            p, f, train=train
        )
        g = f.reshape(f.shape[0], -1)
        out = DenseHead([512, 256, self.out_dim], style="cls_v2", dtype=dt, name="head")(
            g, train=train
        )
        if self.mean_residual:
            out = out + MeanMLP(dtype=dt, name="mean_mlp")(mean, train=train)
        if self.sigmoid_sign:
            return _sign_out(out)
        return out


class GenericPoseHead(nn.Module):
    """Configurable head unifying the whole family (model/pose.py:7-105).

    Flags mirror pose.py's constructor: optional TNet3d input transform
    (:50-57), optional TNetkd feature transform that IS multiplied in
    (:62-64 — unlike rotation.py's dead one), classify branch returning
    ``(log_probs, (-1)**argmax, argmax)`` (:85-89), and mean-residual branch.
    """

    out_dim: int = 3
    mlp: Sequence[int] = (64, 64, 64, 128, 1024)
    fc: Sequence[int] = (512, 256)
    use_input_transform: bool = False
    use_feature_transform: bool = False
    mean_residual: bool = False
    classify: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, points, mean=None, *, train: bool = False):
        dt = self.dtype
        x = points
        if self.use_input_transform:
            t = TNet(k=3, dtype=dt, name="tnet_input")(x[..., :3], train=train)
            geo = jnp.einsum("bnc,bdc->bnd", x[..., :3], t)
            x = jnp.concatenate([geo, x[..., 3:]], axis=-1) if x.shape[-1] > 3 else geo
        x = PointwiseMLP(self.mlp[:2], dtype=dt, name="mlp_pre")(x, train=train)
        if self.use_feature_transform:
            t = TNet(k=self.mlp[1], dtype=dt, name="tnet_feature")(x, train=train)
            x = jnp.einsum("bnc,bdc->bnd", x, t)
        x = PointwiseMLP(self.mlp[2:], dtype=dt, name="mlp_post")(x, train=train)
        g = jnp.max(x, axis=-2)
        out = DenseHead(list(self.fc) + [self.out_dim], style="pose", dtype=dt, name="head")(
            g, train=train
        )
        if self.mean_residual:
            return out + MeanMLP(dtype=dt, name="mean_mlp")(mean, train=train)
        if self.classify:
            log_probs = nn.log_softmax(out.astype(jnp.float32), axis=-1)
            choice = jnp.argmax(log_probs, axis=-1)
            return log_probs, (-1) ** choice, choice
        return out
