"""Tests for generators, dataset build/load/split, and augmentations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointnet_like_pose_estimation_tpu.data import (
    CATEGORIES,
    augment,
    build_dataset,
    clip_half,
    cube_surface,
    cylinder_surface,
    h_structure_surface,
    load_dataset,
    iter_batches,
    sample_category_params,
)
from pointnet_like_pose_estimation_tpu.data.generators import dense_surface


def test_cube_surface_lattice():
    pts = cube_surface(0.05, 0.05, 0.05)
    assert len(pts) > 1024
    # all points on the box surface
    on_face = np.zeros(len(pts), dtype=bool)
    for ax in range(3):
        on_face |= np.isclose(np.abs(pts[:, ax]), 0.025, atol=1e-9)
    assert on_face.all()
    assert np.abs(pts).max() <= 0.025 + 1e-9


def test_cylinder_surface():
    pts = cylinder_surface(0.02, 0.06)
    assert len(pts) > 1024
    r = np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2)
    on_lateral = np.isclose(r, 0.02, atol=1e-9)
    on_cap = np.isclose(np.abs(pts[:, 2]), 0.03, atol=1e-9)
    assert (on_lateral | on_cap).all()
    assert (r <= 0.02 + 1e-9).all()


def test_h_structure_surface():
    pts = h_structure_surface()
    assert len(pts) > 1024
    # pre-rotated 90° about x: original z extent becomes y
    assert np.isclose(pts[:, 1].max(), 0.05, atol=5e-3)


def test_all_categories_generate_enough_points():
    rng = np.random.default_rng(0)
    for cat in CATEGORIES:
        p = sample_category_params(cat, rng)
        dense = dense_surface(p)
        assert len(dense) >= 1024, f"{cat}: only {len(dense)} dense points"


def test_clip_half():
    pts = cube_surface(0.05, 0.05, 0.05)
    clipped = clip_half(pts)
    assert 0 < len(clipped) < len(pts)
    assert clipped[:, 2].min() >= -1e-9


def test_build_and_load_dataset(tmp_path):
    path = str(tmp_path / "ds.npz")
    build_dataset(8, seed=0, path=path, categories=CATEGORIES[:3])
    train = load_dataset(path, "train")
    test = load_dataset(path, "test")
    n_train_pc = round(8 * 6001 / 8000)  # = 6
    assert len(train) == 3 * n_train_pc and len(test) == 3 * (8 - n_train_pc)
    assert train.points.shape[1:] == (1024, 3)
    assert train.rot.shape == (len(train), 3)
    # sign convention: rot_z absolute, sign in {-1, 0, 1}
    assert (train.rot[:, 2] >= 0).all()
    assert set(np.sign(train.sign).tolist()) <= {-1.0, 0.0, 1.0}
    # translation target within generator ranges
    assert (train.tran[:, 2] <= -0.59).all() and (train.tran[:, 2] >= -1.01).all()
    # clouds actually live near their translation target
    centroids = train.points.mean(axis=1)
    assert np.abs(centroids - train.tran).max() < 0.1


def test_iter_batches_shapes_and_shuffle():
    ds = load_dataset(build_dataset(8, seed=1, categories=CATEGORIES[:2]), "train")
    batches = list(iter_batches(ds, 4, rng=np.random.default_rng(0)))
    assert all(b["points"].shape == (4, 1024, 3) for b in batches)
    assert len(batches) == len(ds) // 4


def test_augmentations_semantics():
    key = jax.random.key(0)
    pts = jnp.asarray(np.random.default_rng(2).standard_normal((4, 64, 3)), jnp.float32)

    dropped = augment.random_point_dropout(key, pts)
    # every dropped point equals the first point of its cloud
    eq_first = np.isclose(np.asarray(dropped), np.asarray(pts[:, :1, :])).all(-1)
    changed = ~np.isclose(np.asarray(dropped), np.asarray(pts)).all(-1)
    assert (eq_first | ~changed).all()

    scaled = augment.random_scale(key, pts)
    s = (np.asarray(scaled)[:, 0, 0] / np.asarray(pts)[:, 0, 0]).reshape(4, 1, 1)
    np.testing.assert_allclose(np.asarray(scaled), np.asarray(pts) * s, rtol=1e-4, atol=1e-6)
    assert (s >= 0.8).all() and (s <= 1.25).all()

    shifted = augment.random_shift(key, pts)
    delta = np.asarray(shifted - pts)
    np.testing.assert_allclose(delta, np.broadcast_to(delta[:, :1, :], delta.shape), atol=1e-6)
    assert np.abs(delta).max() <= 0.1

    jittered = augment.jitter(key, pts)
    assert np.abs(np.asarray(jittered - pts)).max() <= 0.05

    shuffled = augment.shuffle_points(key, pts)
    assert sorted(np.asarray(shuffled)[0, :, 0].tolist()) == sorted(
        np.asarray(pts)[0, :, 0].tolist()
    )

    spliced = augment.splice_onehot(pts, jnp.asarray([0, 1, 2, 3]), 7)
    assert spliced.shape == (4, 64, 10)
    oh = np.asarray(spliced)[:, :, 3:]
    assert (oh.sum(-1) == 1).all()
    assert (oh.argmax(-1) == np.asarray([0, 1, 2, 3])[:, None]).all()


def test_cloud_mean_compat():
    pts = jnp.asarray(np.random.default_rng(3).standard_normal((2, 16, 3)), jnp.float32)
    full = augment.cloud_mean(pts)
    np.testing.assert_allclose(np.asarray(full), np.asarray(pts).mean(1), rtol=1e-5)
    first3 = augment.cloud_mean(pts, compat_first3=True)
    np.testing.assert_allclose(
        np.asarray(first3), np.asarray(pts)[:, :3, :].mean(1), rtol=1e-5
    )


def test_train_augment_normalized():
    key = jax.random.key(1)
    pts = jnp.asarray(np.random.default_rng(4).standard_normal((4, 64, 3)), jnp.float32)
    out = augment.train_augment(key, pts)
    r = np.sqrt((np.asarray(out) ** 2).sum(-1)).max(-1)
    np.testing.assert_allclose(r, 1.0, rtol=1e-3)
