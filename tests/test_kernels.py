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
