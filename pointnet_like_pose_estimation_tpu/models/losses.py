"""Loss and metric functions (pure, jittable).

Parity map:
- classification_loss: model/pointnet_cls.py:34-44 (NLL + 0.001 *
  orthogonality of the feature transform) and
  model/pointnet2_cls_ssg.py:40-47 (plain NLL).
- regression_loss: model/rotation.py:52-62 / translation.py:52-62 /
  width.py:46-56 (MSE or L1, mean or sum reduction).
- sign_loss: model/sign.py:46-53 (BCE on sigmoid probabilities). The
  reference feeds ±1 targets from the loader straight into BCELoss
  (train_sign.py:121 vs ModelDataLoader.py:88) which silently treats -1 as
  an out-of-range target; we map sign∈{-1,+1} -> {0,1} before the loss and
  expose ``compat_pm1`` to reproduce the reference's raw behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointnet_like_pose_estimation_tpu.nn.tnet import orthogonality_regularizer


def nll_loss(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean negative log-likelihood over int labels; log_probs [B, C]."""
    picked = jnp.take_along_axis(log_probs, labels[:, None].astype(jnp.int32), axis=1)
    return -jnp.mean(picked)


def classification_loss(
    log_probs: jax.Array,
    labels: jax.Array,
    trans_feat: jax.Array | None = None,
    mat_diff_scale: float = 0.001,
) -> jax.Array:
    """NLL (+ optional feature-transform orthogonality penalty)."""
    loss = nll_loss(log_probs, labels)
    if trans_feat is not None and trans_feat.ndim == 3:
        loss = loss + mat_diff_scale * orthogonality_regularizer(trans_feat)
    return loss


def regression_loss(
    pred: jax.Array,
    target: jax.Array,
    kind: str = "L2_loss",
    reduction: str = "mean",
) -> jax.Array:
    """MSE ('L2_loss') or L1 with torch-style mean/sum reduction."""
    err = pred - target
    per_elem = err * err if kind == "L2_loss" else jnp.abs(err)
    return jnp.sum(per_elem) if reduction == "sum" else jnp.mean(per_elem)


def sign_loss(
    prob: jax.Array, sign_target: jax.Array, *, compat_pm1: bool = False, eps: float = 1e-7
) -> jax.Array:
    """Binary cross-entropy on sigmoid outputs.

    Args:
      prob: [B, 1] probabilities in (0, 1).
      sign_target: [B] or [B, 1]; ±1 (loader convention) or {0,1}.
      compat_pm1: feed the ±1 target into BCE unmapped, reproducing the
        reference's train_sign.py:121 quirk (targets of -1 push the loss
        through the -(1-y)log(1-p) branch with weight 2).
    """
    t = sign_target.reshape(prob.shape).astype(prob.dtype)
    if not compat_pm1:
        # loader gives ±1; map to {0,1} ({0,1} targets pass through unchanged)
        t = jnp.where(t > 0, 1.0, 0.0)
    p = jnp.clip(prob, eps, 1.0 - eps)
    return -jnp.mean(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))


def accuracy(log_probs: jax.Array, labels: jax.Array) -> jax.Array:
    """Instance accuracy from log-probs."""
    return jnp.mean((jnp.argmax(log_probs, axis=-1) == labels).astype(jnp.float32))


def sign_accuracy(hard_sign: jax.Array, sign_target: jax.Array) -> jax.Array:
    """Hard-sign match rate (train_sign.py:124-127 convention)."""
    t = sign_target.reshape(hard_sign.shape).astype(hard_sign.dtype)
    t = jnp.where(t > 0, 1.0, -1.0)
    return jnp.mean((hard_sign == t).astype(jnp.float32))


def mean_abs_error(pred: jax.Array, target: jax.Array, scale: float = 1.0) -> jax.Array:
    """Per-axis-averaged |err| (×100 for cm in translation eval,
    test_translation.py:101)."""
    return jnp.mean(jnp.abs(pred - target)) * scale
