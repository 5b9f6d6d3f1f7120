"""Pipeline tests: deprojection, RANSAC, outliers, DBSCAN, end-to-end graph."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from pointnet_like_pose_estimation_tpu.pipeline import (
    CameraIntrinsics,
    GraspPipeline,
    PipelineConfig,
    clean_scene,
    clip_distance,
    cluster_point,
    dbscan,
    deproject_depth,
    ransac_plane,
    remove_plane,
    remove_radius_outlier,
    remove_statistical_outlier,
)


def _scene(n_plane=3000, n_obj=800, noise=0.0, seed=0):
    """Synthetic table scene: z=0.5 plane + two blobs + sparse outliers."""
    rng = np.random.default_rng(seed)
    plane = np.column_stack(
        [rng.uniform(-0.5, 0.5, n_plane), rng.uniform(-0.5, 0.5, n_plane),
         np.full(n_plane, 0.5) + rng.normal(0, 0.001, n_plane)]
    )
    blob1 = rng.normal(0, 0.01, (n_obj, 3)) + [0.2, 0.0, 0.4]
    blob2 = rng.normal(0, 0.01, (n_obj, 3)) + [-0.2, 0.1, 0.35]
    return plane, blob1, blob2


def test_deproject_depth_roundtrip():
    intr = CameraIntrinsics(width=8, height=6, fx=100.0, fy=100.0, ppx=4.0, ppy=3.0)
    depth = np.full((6, 8), 1000.0)  # 1m everywhere
    pts = np.asarray(deproject_depth(jnp.asarray(depth), intr, flip_yz=False))
    assert pts.shape == (48, 3)
    np.testing.assert_allclose(pts[:, 2], 1.0, rtol=1e-6)
    # center pixel deprojects to (0, 0, 1)
    center = pts.reshape(6, 8, 3)[3, 4]
    np.testing.assert_allclose(center, [0, 0, 1], atol=1e-6)
    flipped = np.asarray(deproject_depth(jnp.asarray(depth), intr, flip_yz=True))
    np.testing.assert_allclose(flipped[:, 2], -1.0, rtol=1e-6)


def test_deproject_with_color_and_json(tmp_path):
    import json

    cfg = {
        "width": 4, "height": 4, "fps": 30,
        "depth_ppx": 2.0, "depth_ppy": 2.0, "depth_fx": 10.0, "depth_fy": 10.0,
        "color_ppx": 2.0, "color_ppy": 2.0, "color_fx": 10.0, "color_fy": 10.0,
    }
    p = tmp_path / "camera.json"
    p.write_text(json.dumps(cfg))
    intr = CameraIntrinsics.from_json(str(p))
    assert intr.fx == 10.0 and intr.width == 4
    depth = np.ones((4, 4)) * 500
    color = np.random.default_rng(0).uniform(size=(4, 4, 3))
    pts = np.asarray(deproject_depth(jnp.asarray(depth), intr, jnp.asarray(color)))
    assert pts.shape == (16, 6)
    np.testing.assert_allclose(pts[:, 3:], color.reshape(-1, 3), rtol=1e-6)


def test_clip_distance():
    pts = np.array([[0, 0, 0.1], [0, 0, 1.0], [0, 0, 3.0]])
    out = clip_distance(pts, (0.0, 2.0), 2)
    assert len(out) == 2


def test_ransac_plane_finds_table():
    plane, blob1, blob2 = _scene()
    pts = np.concatenate([plane, blob1, blob2]).astype(np.float32)
    model, inliers = ransac_plane(pts, distance_threshold=0.006, num_iterations=200)
    # normal should be ±z
    assert abs(model[2]) > 0.99
    # most plane points in, most object points out
    assert inliers[: len(plane)].mean() > 0.95
    assert inliers[len(plane):].mean() < 0.05
    cleaned = remove_plane(pts, distance_threshold=0.006, num_iterations=200)
    assert len(cleaned) < len(pts)
    assert len(cleaned) >= 0.9 * 2 * 800


def test_radius_outlier_removal():
    rng = np.random.default_rng(1)
    dense = rng.normal(0, 0.005, (500, 3))
    sparse = rng.uniform(1.0, 2.0, (20, 3))
    pts = np.concatenate([dense, sparse]).astype(np.float32)
    out = remove_radius_outlier(pts, nb_points=50, radius=0.05)
    assert len(out) >= 450
    assert (np.abs(out) < 0.5).all()


def test_clean_scene_matches_staged_pipeline():
    """Fused plane+radius clean-up == remove_plane -> remove_radius_outlier
    (same seed, identical surviving points)."""
    plane, blob1, blob2 = _scene(seed=7)
    pts = np.concatenate([plane, blob1, blob2]).astype(np.float32)
    staged = remove_plane(pts, distance_threshold=0.006, num_iterations=200)
    staged = remove_radius_outlier(staged, nb_points=30, radius=0.05)
    fused = clean_scene(pts, plane_threshold=0.006, num_iterations=200,
                        radius_nb_points=30, radius=0.05)
    assert staged.shape == fused.shape
    np.testing.assert_array_equal(staged, fused)


def test_statistical_outlier_removal():
    rng = np.random.default_rng(2)
    dense = rng.normal(0, 0.005, (500, 3))
    far = np.array([[0.5, 0.5, 0.5], [-0.5, 0.4, 0.3]])
    pts = np.concatenate([dense, far]).astype(np.float32)
    out = remove_statistical_outlier(pts, nb_neighbors=20, std_ratio=2.0)
    assert len(out) < len(pts)
    assert (np.abs(out) < 0.4).all()


def test_fps_bucketing_is_output_stable():
    """The bucketing in cluster_point/_resample relies on two FPS
    properties: prefix stability (selection t ignores later selections) and
    pad invisibility (duplicate pads of the start point keep min-dist 0 and
    lose every first-index argmax tie-break)."""
    from pointnet_like_pose_estimation_tpu.ops import farthest_point_sample

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(2, 500, 3)).astype(np.float32)
    base = np.asarray(farthest_point_sample(jnp.asarray(pts), 64))
    padded = np.concatenate([pts, np.tile(pts[:, :1], (1, 268, 1))], axis=1)
    big = np.asarray(farthest_point_sample(jnp.asarray(padded), 256))
    np.testing.assert_array_equal(big[:, :64], base)


def test_dbscan_two_clusters():
    _, blob1, blob2 = _scene(n_obj=600)
    pts = np.concatenate([blob1, blob2])
    labels = dbscan(pts, eps=0.03, min_points=50)
    assert labels.max() == 1  # exactly two clusters
    # blobs are separated: each blob maps to one label
    assert len(set(labels[:600].tolist())) == 1
    assert len(set(labels[600:].tolist())) == 1
    assert labels[0] != labels[600]


def test_dbscan_noise():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (100, 3))  # sparse: all noise
    labels = dbscan(pts, eps=0.01, min_points=10)
    assert (labels == -1).all()


def test_cluster_point_shapes():
    _, blob1, blob2 = _scene(n_obj=600)
    pts = np.concatenate([blob1, blob2[:400]]).astype(np.float32)
    clusters = cluster_point(pts, eps=0.03, min_points=50)
    assert clusters is not None
    assert clusters.shape == (2, 400, 3)
    assert cluster_point(np.random.uniform(-1, 1, (50, 3)), 0.01, 30) is None


@pytest.fixture(scope="module")
def tiny_pipeline():
    cfg = PipelineConfig(
        num_points=64,
        min_points=50,
        radius_nb_points=20,
        radius=0.05,
        plane_iterations=100,
        eps=0.05,
    )
    return GraspPipeline.from_random(cfg)


def test_end_to_end_pipeline(tiny_pipeline):
    plane, blob1, blob2 = _scene(n_obj=300)
    # put everything in front of the camera in +z
    pts = np.concatenate([plane, blob1, blob2]).astype(np.float32)
    out = tiny_pipeline(pts)
    assert out is not None
    K = out["clusters"].shape[0]
    assert K >= 1
    assert out["pred_class"].shape == (K,)
    assert out["rotation_deg"].shape == (K, 3)
    assert out["rotation_matrix"].shape == (K, 3, 3)
    assert out["translation"].shape == (K, 3)
    assert out["width"].shape == (K,)
    assert ((out["sign_prob"] > 0) & (out["sign_prob"] < 1)).all()
    # rotation matrices are orthonormal
    eye = np.einsum("kij,klj->kil", out["rotation_matrix"], out["rotation_matrix"])
    np.testing.assert_allclose(eye, np.eye(3)[None].repeat(K, 0), atol=1e-5)


def test_fused_scene_path_matches_staged(tiny_pipeline):
    """__call__'s two-dispatch fused path (clean_scene + _infer_scene) must
    be output-identical to the staged preprocess -> infer_clusters chain,
    in both the FPS-resample and tile-resample branches."""
    plane, blob1, blob2 = _scene(n_obj=300)
    pts = np.concatenate([plane, blob1, blob2]).astype(np.float32)
    fused = tiny_pipeline(pts)
    clusters = tiny_pipeline.preprocess(pts)
    staged = tiny_pipeline.infer_clusters(clusters)
    staged["clusters"] = clusters
    assert fused is not None and set(fused) == set(staged)
    # tiny_pipeline has num_points=64 < cluster size -> "fps" branch
    assert clusters.shape[1] > tiny_pipeline.cfg.num_points
    for k in fused:
        np.testing.assert_allclose(
            np.asarray(fused[k], np.float32), np.asarray(staged[k], np.float32),
            rtol=1e-5, atol=1e-6, err_msg=k)
    # "tile" branch: num_points larger than any cluster
    big = PipelineConfig(
        num_points=512, min_points=50, radius_nb_points=20, radius=0.05,
        plane_iterations=100, eps=0.05)
    pipe2 = GraspPipeline(big, tiny_pipeline.models)
    fused2 = pipe2(pts)
    clusters2 = pipe2.preprocess(pts)
    staged2 = pipe2.infer_clusters(clusters2)
    staged2["clusters"] = clusters2
    assert clusters2.shape[1] < big.num_points
    for k in fused2:
        np.testing.assert_allclose(
            np.asarray(fused2[k], np.float32), np.asarray(staged2[k], np.float32),
            rtol=1e-5, atol=1e-6, err_msg=k)


def test_stream_matches_sequential(tiny_pipeline):
    """Pipelined stream() yields per-frame results identical to __call__,
    in order, including None frames."""
    plane, blob1, blob2 = _scene(n_obj=300)
    sceneA = np.concatenate([plane, blob1, blob2]).astype(np.float32)
    empty = np.full((60, 3), 5.0, np.float32)        # beyond clip range
    sceneB = np.concatenate([plane, blob1 + 0.01, blob2]).astype(np.float32)
    frames = [sceneA, empty, sceneB]
    streamed = list(tiny_pipeline.stream(frames))
    sequential = [tiny_pipeline(f) for f in frames]
    assert len(streamed) == 3 and streamed[1] is None and sequential[1] is None
    for got, want in zip(streamed, sequential):
        if want is None:
            assert got is None
            continue
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), err_msg=k)


def test_pipeline_none_when_empty(tiny_pipeline):
    pts = np.random.default_rng(4).uniform(-1, 1, (60, 3)).astype(np.float32)
    pts[:, 2] = 5.0  # all beyond clip range
    assert tiny_pipeline(pts) is None


def test_native_dbscan_matches_python():
    from pointnet_like_pose_estimation_tpu.pipeline import native_dbscan

    _, blob1, blob2 = _scene(n_obj=500, seed=7)
    rng = np.random.default_rng(8)
    noise = rng.uniform(-1, 1, (50, 3))
    pts = np.concatenate([blob1, blob2, noise])
    native = native_dbscan.dbscan(pts, 0.03, 40)
    if native is None:
        pytest.skip("native library unavailable")
    py = dbscan(pts, 0.03, 40, use_native=False)
    # same cluster structure up to label permutation
    assert (native == -1).sum() == (py == -1).sum()
    assert native.max() == py.max()
    for c in range(py.max() + 1):
        members = np.where(py == c)[0]
        assert len(set(native[members].tolist())) == 1


def test_native_radius_counts():
    from pointnet_like_pose_estimation_tpu.pipeline import native_dbscan

    rng = np.random.default_rng(9)
    pts = rng.normal(0, 0.01, (300, 3))
    counts = native_dbscan.radius_counts(pts, 0.05)
    if counts is None:
        pytest.skip("native library unavailable")
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    want = ((d2 <= 0.05**2).sum(1) - 1).astype(np.int32)
    np.testing.assert_array_equal(counts, want)


def test_mesh_sharded_cluster_inference():
    from pointnet_like_pose_estimation_tpu.parallel import make_mesh

    cfg = PipelineConfig(num_points=64, num_classes=7)
    mesh = make_mesh()
    pipe = GraspPipeline.from_random(cfg)
    pipe_mesh = GraspPipeline(cfg, pipe.models, mesh=mesh)
    rng = np.random.default_rng(11)
    clusters = rng.normal(0, 0.01, (3, 64, 3)).astype(np.float32)  # K=3 pads to 8
    a = pipe.infer_clusters(clusters)
    b = pipe_mesh.infer_clusters(clusters)
    assert b["translation"].shape == (3, 3)
    np.testing.assert_allclose(a["translation"], b["translation"], rtol=1e-3, atol=1e-5)
    np.testing.assert_array_equal(a["pred_class"], b["pred_class"])


def test_pipeline_bfloat16_inference():
    """bf16 compute dtype: outputs finite, float32 out, matrices orthonormal."""
    cfg = PipelineConfig(num_points=32, classifier="pointnet_cls", dtype="bfloat16")
    pipe = GraspPipeline.from_random(cfg)
    xyz = jnp.asarray(np.random.default_rng(0).standard_normal((4, 32, 3)), jnp.float32)
    out = jax.tree.map(np.asarray, pipe._infer(xyz))
    assert np.isfinite(out["translation"]).all()
    eye = np.einsum("kij,klj->kil", out["rotation_matrix"], out["rotation_matrix"])
    np.testing.assert_allclose(eye, np.eye(3)[None].repeat(4, 0), atol=2e-2)
