"""Batch augmentations as pure jitted functions over PRNG keys.

The reference augments per-sample in host numpy python loops inside the hot
training loop (provider.py:118-180, train_classification.py:105-113) — a
major host bottleneck. Here every augmentation is a vectorized device
function; ``train_augment`` fuses the classification pipeline
(dropout -> scale -> shift -> normalize) into whatever jit context calls it,
so augmentation compiles into the train step and never touches the host.

Parity map (semantics, same distributions):
- random_point_dropout  -> provider.py:157-164 (per-cloud ratio U[0,0.875],
  dropped points replaced by the cloud's first point)
- random_scale          -> provider.py:144-155 (per-cloud U[0.8, 1.25])
- random_shift          -> provider.py:131-142 (per-cloud U[-0.1, 0.1]^3)
- jitter                -> provider.py:118-129 (clipped gaussian)
- shuffle_points        -> provider.py:54-64 (one permutation per batch)
- splice_onehot         -> provider.py:166-180 (channels-last here)
- cloud_mean            -> train_translation.py:113 (with the reference's
  first-3-POINTS quirk reproducible via compat_first3)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pointnet_like_pose_estimation_tpu.ops import normalize_cloud

# Reference augmentation distributions (provider.py:131-155). These are the
# single source of truth — train/steps.py's label-consistent branch draws
# from the SAME constants so the two arms of the label-noise A/B
# (PARITY.md) can never silently diverge.
SCALE_LO, SCALE_HI = 0.8, 1.25
SHIFT_RANGE = 0.1


def random_point_dropout(key: jax.Array, points: jax.Array, max_ratio: float = 0.875) -> jax.Array:
    """Replace a random subset of each cloud with its first point."""
    B, N, _ = points.shape
    k1, k2 = jax.random.split(key)
    ratio = jax.random.uniform(k1, (B, 1)) * max_ratio
    drop = jax.random.uniform(k2, (B, N)) <= ratio            # [B, N]
    return jnp.where(drop[..., None], points[:, :1, :], points)


def random_scale(key: jax.Array, points: jax.Array, lo: float = SCALE_LO, hi: float = SCALE_HI) -> jax.Array:
    """Per-cloud uniform scale."""
    B = points.shape[0]
    s = jax.random.uniform(key, (B, 1, 1), minval=lo, maxval=hi)
    return points * s


def random_shift(key: jax.Array, points: jax.Array, rng: float = SHIFT_RANGE) -> jax.Array:
    """Per-cloud uniform translation."""
    B, _, C = points.shape
    t = jax.random.uniform(key, (B, 1, C), minval=-rng, maxval=rng)
    return points + t


def jitter(key: jax.Array, points: jax.Array, sigma: float = 0.01, clip: float = 0.05) -> jax.Array:
    """Clipped per-point gaussian noise."""
    noise = jnp.clip(sigma * jax.random.normal(key, points.shape), -clip, clip)
    return points + noise


def shuffle_points(key: jax.Array, points: jax.Array) -> jax.Array:
    """One random point permutation shared across the batch (changes FPS)."""
    perm = jax.random.permutation(key, points.shape[1])
    return points[:, perm, :]


def splice_onehot(points: jax.Array, labels: jax.Array, num_classes: int) -> jax.Array:
    """Append a one-hot class vector to every point's channels."""
    B, N, _ = points.shape
    oh = jax.nn.one_hot(labels, num_classes, dtype=points.dtype)  # [B, C]
    return jnp.concatenate([points, jnp.broadcast_to(oh[:, None, :], (B, N, num_classes))], axis=-1)


def cloud_mean(points: jax.Array, *, compat_first3: bool = False) -> jax.Array:
    """Cloud centroid fed to the translation head's mean-MLP.

    The reference computes ``np.mean(points[:, :3, :], axis=1)`` on the
    pre-transpose [B, N, C] batch (train_translation.py:113) — the mean of
    the first THREE POINTS, not of all points. ``compat_first3=True``
    reproduces that; the default is the intended full centroid.
    """
    if compat_first3:
        return jnp.mean(points[:, :3, :], axis=1)
    return jnp.mean(points, axis=1)


def train_augment(key: jax.Array, points: jax.Array) -> jax.Array:
    """The classification train-time pipeline of train_classification.py:108-112:
    dropout -> scale -> shift -> normalize."""
    k1, k2, k3 = jax.random.split(key, 3)
    p = random_point_dropout(k1, points)
    p = random_scale(k2, p)
    p = random_shift(k3, p)
    return normalize_cloud(p)


def eval_preprocess(points: jax.Array) -> jax.Array:
    """Eval-time preprocessing (test_*.py:71-76): normalize only."""
    return normalize_cloud(points)
