"""Golden tests: jnp ops vs the numpy oracle (reference semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from pointnet_like_pose_estimation_tpu import ops


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.default_rng(0)
    return rng.standard_normal((4, 128, 3)).astype(np.float32)


def test_square_distance(clouds):
    dst = clouds[:, :64, :] + 0.25
    got = np.asarray(ops.square_distance(jnp.asarray(clouds), jnp.asarray(dst)))
    want = oracle.square_distance(clouds, dst)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_index_points_2d(clouds):
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 128, size=(4, 17))
    got = np.asarray(ops.index_points(jnp.asarray(clouds), jnp.asarray(idx)))
    want = np.stack([clouds[b][idx[b]] for b in range(4)])
    np.testing.assert_array_equal(got, want)


def test_index_points_3d(clouds):
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 128, size=(4, 17, 9))
    got = np.asarray(ops.index_points(jnp.asarray(clouds), jnp.asarray(idx)))
    want = np.stack([clouds[b][idx[b]] for b in range(4)])
    np.testing.assert_array_equal(got, want)


def test_fps_matches_oracle(clouds):
    start = np.array([0, 5, 17, 100])
    got = np.asarray(
        ops.farthest_point_sample(jnp.asarray(clouds), 32, start_idx=jnp.asarray(start))
    )
    want = oracle.farthest_point_sample(clouds.astype(np.float64), 32, start)
    np.testing.assert_array_equal(got, want)


def test_fps_indices_distinct(clouds):
    idx = np.asarray(ops.farthest_point_sample(jnp.asarray(clouds), 64))
    for b in range(idx.shape[0]):
        assert len(set(idx[b].tolist())) == 64


def test_fps_random_start_in_range(clouds):
    idx = np.asarray(
        ops.farthest_point_sample(jnp.asarray(clouds), 8, key=jax.random.key(3))
    )
    assert idx.min() >= 0 and idx.max() < 128


def test_query_ball_point(clouds):
    centroids = clouds[:, ::8, :]  # 16 centroids
    for radius in (0.3, 0.8, 2.0):
        got = np.asarray(
            ops.query_ball_point(radius, 12, jnp.asarray(clouds), jnp.asarray(centroids))
        )
        want = oracle.query_ball_point(radius, 12, clouds, centroids)
        np.testing.assert_array_equal(got, want, err_msg=f"radius={radius}")


def test_sample_and_group_shapes(clouds):
    feats = jnp.ones((4, 128, 5))
    c, g = ops.sample_and_group(jnp.asarray(clouds), feats, 16, 8, 0.5)
    assert c.shape == (4, 16, 3)
    assert g.shape == (4, 16, 8, 8)
    # centered coords: every selected (or pad-duplicated) point is in-ball
    dists = np.sqrt((np.asarray(g)[..., :3] ** 2).sum(-1))
    assert dists.max() <= 0.5 + 1e-5


def test_sample_and_group_all(clouds):
    feats = jnp.ones((4, 128, 5))
    c, g = ops.sample_and_group_all(jnp.asarray(clouds), feats)
    assert c.shape == (4, 1, 3) and np.all(np.asarray(c) == 0)
    assert g.shape == (4, 1, 128, 8)
    np.testing.assert_allclose(np.asarray(g)[..., :3], clouds[:, None])


def test_normalize_cloud(clouds):
    got = np.asarray(ops.normalize_cloud(jnp.asarray(clouds)))
    want = oracle.normalization(clouds)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    r = np.sqrt((got**2).sum(-1)).max(-1)
    np.testing.assert_allclose(r, 1.0, rtol=1e-4)


def test_euler_rotation(clouds):
    ang = np.array([0.3, -0.7, 1.2])
    got = np.asarray(ops.rotate_euler(jnp.asarray(clouds), jnp.asarray(ang)))
    R = oracle.euler_rotation_matrix(ang)
    want = clouds @ R.T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rotate_euler_batched(clouds):
    angs = np.random.default_rng(4).uniform(-1, 1, size=(4, 3))
    got = np.asarray(ops.rotate_euler(jnp.asarray(clouds), jnp.asarray(angs)))
    for b in range(4):
        want = clouds[b] @ oracle.euler_rotation_matrix(angs[b]).T
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-5)


def test_ops_jit_under_vmap(clouds):
    # everything must compose with jit; smoke the whole grouping path jitted
    fn = jax.jit(
        lambda p: ops.sample_and_group(p, None, 16, 8, 0.4)[1]
    )
    out = fn(jnp.asarray(clouds))
    assert out.shape == (4, 16, 8, 3)


def test_query_ball_point_chunked_matches(clouds):
    from pointnet_like_pose_estimation_tpu.ops.grouping import query_ball_point_chunked

    centroids = clouds[:, :64, :]
    for radius in (0.4, 1.0):
        a = np.asarray(ops.query_ball_point(radius, 8, jnp.asarray(clouds), jnp.asarray(centroids)))
        b = np.asarray(
            query_ball_point_chunked(radius, 8, jnp.asarray(clouds), jnp.asarray(centroids), tile=16)
        )
        np.testing.assert_array_equal(a, b)
    # non-divisible S falls back to the dense path
    c = np.asarray(
        query_ball_point_chunked(0.4, 8, jnp.asarray(clouds), jnp.asarray(clouds[:, :50, :]), tile=16)
    )
    assert c.shape == (4, 50, 8)


def test_query_ball_point_empty_ball_clamps(clouds):
    # a centroid far outside the cloud has ZERO in-ball neighbors; the
    # reference would emit the sentinel N and crash on the gather — all our
    # impls clamp to N-1 (ops/grouping.py), and the oracle documents it
    B, N, _ = clouds.shape
    far = np.full((B, 2, 3), 100.0, np.float32)
    got = np.asarray(
        ops.query_ball_point(0.1, 8, jnp.asarray(clouds), jnp.asarray(far))
    )
    want = oracle.query_ball_point(0.1, 8, clouds, far)
    np.testing.assert_array_equal(got, want)
    assert got.max() <= N - 1  # in-bounds for any gather
    assert (got == N - 1).all()


def test_index_points_matmul_vjp_matches_scatter(clouds):
    """The one-hot segment-sum backward (PLPE_GATHER_VJP=matmul) must equal
    XLA's native scatter-add transpose: same dPoints for duplicate indices
    (ball-query pads repeat the first in-ball index, so duplicates are the
    common case, pointnet2_utils.py:85-89)."""
    import jax

    from pointnet_like_pose_estimation_tpu.ops import geometry

    feats = jnp.asarray(np.random.default_rng(3).standard_normal((4, 100, 16)),
                        jnp.float32)
    idx = jnp.asarray(
        np.random.default_rng(4).integers(0, 100, (4, 12, 8)), jnp.int32
    )
    idx = idx.at[:, :, 1].set(idx[:, :, 0])  # force duplicates

    def loss(f, gather):
        return jnp.sum(jnp.sin(gather(f, idx)))

    g_scatter = jax.grad(lambda f: loss(f, geometry._gather))(feats)
    g_matmul = jax.grad(lambda f: loss(f, geometry._gather_matmul_vjp))(feats)
    np.testing.assert_allclose(
        np.asarray(g_scatter), np.asarray(g_matmul), rtol=1e-5, atol=1e-5
    )

    # the dispatching wrapper stays correct in both modes
    old = geometry._GATHER_VJP
    try:
        for mode in ("scatter", "matmul", "auto"):
            geometry._GATHER_VJP = mode
            g = jax.grad(lambda f: loss(f, geometry.index_points))(feats)
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(g_scatter), rtol=1e-5, atol=1e-5
            )
    finally:
        geometry._GATHER_VJP = old


def test_index_points_chunked_vjp_matches_scatter():
    """Beyond the one-hot budget the matmul backward K-chunks the segment
    sum under lax.scan (_chunked_segment_sum); the accumulated gradient
    must still equal the native scatter transpose exactly — including with
    duplicate indices and a ragged tail chunk (SK not divisible by the
    lane-aligned chunk size)."""
    import jax

    from pointnet_like_pose_estimation_tpu.ops import geometry

    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.standard_normal((3, 64, 5)), jnp.float32)
    # SK = 11*7 = 77: not a multiple of 8, forces tail padding
    idx = jnp.asarray(rng.integers(0, 64, (3, 11, 7)), jnp.int32)
    idx = idx.at[:, :, 2].set(idx[:, :, 0])  # duplicates

    def loss(f, gather):
        return jnp.sum(jnp.cos(gather(f, idx)))

    g_scatter = jax.grad(lambda f: loss(f, geometry._gather))(feats)

    old = geometry._ONEHOT_BUDGET
    try:
        # budget below one chunk's bytes -> multiple chunks guaranteed
        geometry._ONEHOT_BUDGET = 3 * 16 * 64 * 4
        g_chunked = jax.grad(
            lambda f: loss(f, geometry._gather_matmul_vjp)
        )(feats)
    finally:
        geometry._ONEHOT_BUDGET = old
    np.testing.assert_allclose(
        np.asarray(g_scatter), np.asarray(g_chunked), rtol=1e-5, atol=1e-5
    )


def test_chunked_segment_sum_transient_is_bounded():
    """The chunk size is derived so B*chunk*N*4 stays within the budget
    (lane-aligned up to 8); verify the arithmetic picks >1 chunk and the
    forward value is untouched by the custom-vjp wrapper."""
    from pointnet_like_pose_estimation_tpu.ops import geometry

    feats = jnp.asarray(np.arange(2 * 32 * 3, dtype=np.float32).reshape(2, 32, 3))
    idx = jnp.asarray(np.random.default_rng(0).integers(0, 32, (2, 40)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(geometry._gather_matmul_vjp(feats, idx)),
        np.asarray(geometry._gather(feats, idx)),
    )
