"""Pallas kernels vs jnp reference impls (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointnet_like_pose_estimation_tpu.kernels import fps_pallas
from pointnet_like_pose_estimation_tpu.ops import farthest_point_sample


@pytest.mark.parametrize("shape", [(2, 128, 3), (4, 256, 3)])
def test_fps_pallas_matches_reference(shape):
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    S = shape[1] // 4
    want = farthest_point_sample(pts, S, start_idx=0)
    got = fps_pallas(pts, S, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fps_pallas_custom_start():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.standard_normal((3, 64, 3)), jnp.float32)
    start = jnp.asarray([5, 0, 63], jnp.int32)
    want = farthest_point_sample(pts, 16, start_idx=start)
    got = fps_pallas(pts, 16, start_idx=start, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ball_group_pallas_matches_reference():
    from pointnet_like_pose_estimation_tpu.kernels.ball_group import ball_group_pallas
    from pointnet_like_pose_estimation_tpu.ops import (
        index_points,
        query_ball_point,
        sample_and_group,
    )

    rng = np.random.default_rng(5)
    B, N, S, K, D = 2, 256, 32, 8, 5
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    # centroids are actual cloud points (as FPS produces)
    cent = xyz[:, ::8, :]  # [B, 32, 3]

    for radius in (0.5, 1.5):
        idx = query_ball_point(radius, K, xyz, cent)
        want = index_points(xyz, idx) - cent[:, :, None, :]
        want = jnp.concatenate([want, index_points(feats, idx)], axis=-1)
        got = ball_group_pallas(
            jnp.concatenate([xyz, feats], -1), cent,
            radius=radius, num_neighbors=K, tile=32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5,
            err_msg=f"radius={radius}",
        )


def test_ball_group_pallas_lowers_for_tpu():
    # lowering probe (no execution): all primitives must be Mosaic-supported
    import jax

    if "TPU" not in str(jax.devices()[0]).upper() and jax.default_backend() == "cpu":
        pytest.skip("needs a TPU lowering target")
