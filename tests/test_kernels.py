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


def test_ball_query_pallas_matches_reference():
    """Kernel indices equal ops.query_ball_point exactly (K lowest in-ball,
    pad-with-first — pointnet2_utils.py:70-90 semantics)."""
    from pointnet_like_pose_estimation_tpu.kernels.ball_group import ball_query_pallas
    from pointnet_like_pose_estimation_tpu.ops import query_ball_point

    rng = np.random.default_rng(5)
    B, N, K, D = 2, 256, 8, 4
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    # centroids are actual cloud points (as FPS produces)
    cent = xyz[:, ::8, :]  # [B, 32, 3]

    for radius in (0.5, 1.5):
        want = query_ball_point(radius, K, xyz, cent)
        got = ball_query_pallas(xyz, cent, radius, K, 32, True)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=f"radius={radius}"
        )

    # multi-channel "points" (spliced one-hot): distances use ALL channels
    onehot = np.zeros((B, N, D), np.float32)
    onehot[:, :, 1] = 1.0
    pts = jnp.concatenate([xyz, jnp.asarray(onehot)], -1)
    cpad = jnp.concatenate([cent, jnp.asarray(onehot[:, ::8])], -1)
    want = query_ball_point(0.8, K, pts, cpad)
    got = ball_query_pallas(pts, cpad, 0.8, K, 32, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ball_query_multi_matches_per_scale():
    """The fused multi-scale kernel slice-for-slice equals per-scale calls
    (one distance eval shared across radii — SURVEY §7.7 fusion)."""
    from pointnet_like_pose_estimation_tpu.kernels.ball_group import (
        ball_query_multi_pallas,
        ball_query_pallas,
    )

    rng = np.random.default_rng(11)
    B, N = 2, 256
    xyz = jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32)
    cent = xyz[:, ::8, :]                                     # [B, 32, 3]
    radii, ks = (0.4, 0.8, 1.6), (4, 8, 16)

    fused = ball_query_multi_pallas(xyz, cent, radii, ks, 32, True)
    assert fused.shape == (B, 32, sum(ks))
    offset = 0
    for r, K in zip(radii, ks):
        want = ball_query_pallas(xyz, cent, r, K, 32, True)
        np.testing.assert_array_equal(
            np.asarray(fused[:, :, offset : offset + K]),
            np.asarray(want),
            err_msg=f"scale r={r}",
        )
        offset += K


def test_grouping_gradients_pallas_dispatch_matches_xla():
    """With grouping routed to the Pallas ball query, gradients of a
    sample_and_group consumer equal the XLA path's: the kernel emits integer
    indices, so the backward is XLA's own gather transpose (scatter-add) —
    no custom VJP involved."""
    from pointnet_like_pose_estimation_tpu.kernels import flags
    from pointnet_like_pose_estimation_tpu.ops import sample_and_group

    rng = np.random.default_rng(6)
    pts = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)

    def loss(p):
        _, g = sample_and_group(p, None, 16, 8, 0.8)
        return jnp.sum(jnp.sin(g))

    flags.set_impls(grouping="xla")
    try:
        ga = jax.grad(loss)(pts)
        flags.set_impls(grouping="pallas_interpret")
        gb = jax.grad(loss)(pts)
    finally:
        flags.set_impls(grouping="auto")
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-5)


def test_kernels_lower_and_run_on_tpu():
    """On a real TPU backend: both kernels must COMPILE through Mosaic and
    execute, and their results must match the XLA implementations bit-for-bit
    — the guard VERDICT r1 asked for (a Mosaic rejection otherwise only
    surfaces on hardware while CPU-interpret tests stay green). Skipped on
    the CPU test platform."""
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("needs a real TPU backend (runs in scripts/tpu_checks.py)")

    from pointnet_like_pose_estimation_tpu.kernels.ball_group import ball_query_pallas
    from pointnet_like_pose_estimation_tpu.ops import query_ball_point

    from pointnet_like_pose_estimation_tpu.kernels import flags

    rng = np.random.default_rng(13)
    pts = jnp.asarray(rng.standard_normal((4, 1024, 3)), jnp.float32)
    jax.jit(lambda p: fps_pallas(p, 256)).lower(pts).compile()
    got = fps_pallas(pts, 256)
    flags.set_impls(fps="xla")  # oracle must NOT auto-dispatch back to pallas
    try:
        want = farthest_point_sample(pts, 256)
    finally:
        flags.set_impls(fps="auto")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    cent = pts[:, :128, :]
    idx = ball_query_pallas(pts, cent, 0.4, 32)
    flags.set_impls(grouping="xla")  # oracle must NOT auto-dispatch back
    try:
        want_idx = query_ball_point(0.4, 32, pts, cent)
    finally:
        flags.set_impls(grouping="auto")
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))


def test_sample_and_group_pallas_dispatch_matches_xla():
    from pointnet_like_pose_estimation_tpu.kernels import flags
    from pointnet_like_pose_estimation_tpu.ops import sample_and_group

    rng = np.random.default_rng(7)
    # multi-channel "points" like a spliced pose input (one-hot constant/cloud)
    xyz = rng.standard_normal((2, 256, 3)).astype(np.float32)
    onehot = np.zeros((2, 256, 4), np.float32)
    onehot[0, :, 1] = 1.0
    onehot[1, :, 2] = 1.0
    pts = jnp.asarray(np.concatenate([xyz, onehot], -1))

    flags.set_impls(grouping="xla")
    try:
        _, want = sample_and_group(pts, None, 128, 16, 0.6)
        flags.set_impls(grouping="pallas_interpret")
        _, got = sample_and_group(pts, None, 128, 16, 0.6)
    finally:
        flags.set_impls(grouping="auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_msg_layer_pallas_dispatch_matches_xla():
    import flax.linen  # noqa: F401
    from pointnet_like_pose_estimation_tpu.kernels import flags
    from pointnet_like_pose_estimation_tpu.nn import SetAbstractionMSG

    rng = np.random.default_rng(8)
    pts = jnp.asarray(rng.standard_normal((2, 256, 3)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, 256, 6)), jnp.float32)
    layer = SetAbstractionMSG(128, [8, 16], [0.4, 0.8], [[16, 32], [16, 32]])
    variables = layer.init(jax.random.key(0), pts, feats, train=True)

    flags.set_impls(grouping="xla")
    try:
        c_a, f_a = layer.apply(variables, pts, feats, train=False)
        flags.set_impls(grouping="pallas_interpret")
        c_b, f_b = layer.apply(variables, pts, feats, train=False)
    finally:
        flags.set_impls(grouping="auto")
    np.testing.assert_allclose(np.asarray(c_a), np.asarray(c_b), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f_a), np.asarray(f_b), rtol=1e-3, atol=1e-5)


def test_fps_dispatch_matches_xla_and_is_differentiable():
    """ops.farthest_point_sample routed to the Pallas kernel gives identical
    indices, and gradients flow through a downstream gather (the kernel
    itself is behind stop_gradient — indices carry no tangent)."""
    from pointnet_like_pose_estimation_tpu.kernels import flags
    from pointnet_like_pose_estimation_tpu.ops import (
        farthest_point_sample,
        index_points,
    )

    rng = np.random.default_rng(9)
    pts = jnp.asarray(rng.standard_normal((3, 200, 3)), jnp.float32)

    flags.set_impls(fps="xla")
    try:
        want = farthest_point_sample(pts, 64)
        flags.set_impls(fps="pallas_interpret")
        got = farthest_point_sample(pts, 64)

        def loss(p):
            idx = farthest_point_sample(p, 64)
            return jnp.sum(index_points(p, idx) ** 2)

        g = jax.grad(loss)(pts)
    finally:
        flags.set_impls(fps="auto")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert np.isfinite(np.asarray(g)).all() and float(jnp.linalg.norm(g)) > 0


def _randomize_bn(variables, seed=0):
    """Give BN layers nontrivial running stats + affine params so folding
    is actually exercised (init is mean=0/var=1/scale=1/bias=0)."""
    import numpy as np

    rng = np.random.default_rng(seed)

    def rand_stats(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = rand_stats(v)
            elif k == "var":
                out[k] = jnp.asarray(rng.uniform(0.5, 2.0, v.shape), v.dtype)
            elif k == "mean":
                out[k] = jnp.asarray(rng.normal(0, 0.3, v.shape), v.dtype)
            else:
                out[k] = v
        return out

    def rand_bn_params(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = rand_bn_params(v)
            elif k == "scale":
                out[k] = jnp.asarray(rng.uniform(0.5, 1.5, v.shape), v.dtype)
            elif k == "bias" :
                out[k] = jnp.asarray(rng.normal(0, 0.2, v.shape), v.dtype)
            else:
                out[k] = v
        return out

    return {
        "params": rand_bn_params(variables["params"]),
        "batch_stats": rand_stats(variables["batch_stats"]),
    }


def test_fused_sa_ssg_matches_model_eval():
    """The fused SA inference path (select+gather+MLP+max in one kernel, BN
    folded) matches model.apply(train=False) for pointnet2_cls_ssg."""
    import numpy as np

    from pointnet_like_pose_estimation_tpu.models.fast_infer import (
        build_pn2_ssg_infer,
    )
    from pointnet_like_pose_estimation_tpu.train import TrainConfig
    from pointnet_like_pose_estimation_tpu.train.loop import build_state

    cfg = TrainConfig.for_model("pointnet2_cls_ssg", num_points=256)
    _, model, state = build_state(cfg)
    variables = _randomize_bn(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    pts = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 3))
    want_lp, _, want_pred = model.apply(variables, pts, train=False)

    fwd = build_pn2_ssg_infer(variables, interpret=True)
    got_lp, got_pred = fwd(pts)
    np.testing.assert_allclose(
        np.asarray(got_lp), np.asarray(want_lp), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got_pred), np.asarray(want_pred))


def test_fused_sa_msg_matches_model_eval():
    import numpy as np

    from pointnet_like_pose_estimation_tpu.models.fast_infer import (
        build_pn2_msg_infer,
    )
    from pointnet_like_pose_estimation_tpu.train import TrainConfig
    from pointnet_like_pose_estimation_tpu.train.loop import build_state

    cfg = TrainConfig.for_model("pointnet2_cls_msg", num_points=128)
    _, model, state = build_state(cfg)
    variables = _randomize_bn(
        {"params": state.params, "batch_stats": state.batch_stats}, seed=1
    )
    pts = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 3))
    want_lp, _, want_pred = model.apply(variables, pts, train=False)

    fwd = build_pn2_msg_infer(variables, interpret=True)
    got_lp, got_pred = fwd(pts)
    np.testing.assert_allclose(
        np.asarray(got_lp), np.asarray(want_lp), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got_pred), np.asarray(want_pred))
