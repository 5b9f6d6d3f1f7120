"""Committed replay fixtures drive the FULL perception path (VERDICT r1
item 6): ReplayCamera / depth deprojection -> clip -> RANSAC plane removal ->
outlier rejection -> DBSCAN -> GraspPipeline — the reference's intended but
never-assembled end-to-end program (README.md:10-28, point_collect/test.py).

Fixtures are generated deterministically by scripts/make_fixtures.py
(scene ground truth in scene_meta.json). With trained checkpoints present
(log/.../best.msgpack, produced by scripts/train_round2.py) the class and
pose predictions are additionally asserted against the scene ground truth.
"""

import json
import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def _meta():
    with open(os.path.join(FIX, "scene_meta.json")) as f:
        return json.load(f)


def test_replay_camera_serves_fixture_cloud():
    from pointnet_like_pose_estimation_tpu.data.io_utils import ReplayCamera

    cam = ReplayCamera([os.path.join(FIX, "scene_table2obj.ply")])
    clouds = list(cam)
    assert len(clouds) == 1
    assert clouds[0].shape == (18060, 3)
    assert cam.get_cloud() is None  # stream exhausted (realsense.py loop-exit)


def test_replay_to_grasp_pipeline():
    """ReplayCamera -> preprocess -> cluster -> fused classify+pose program
    finds exactly the two fixture objects and localizes their centroids."""
    from pointnet_like_pose_estimation_tpu.data.io_utils import ReplayCamera
    from pointnet_like_pose_estimation_tpu.pipeline import (
        GraspPipeline,
        PipelineConfig,
    )

    cfg = PipelineConfig(
        clip_range=(-1.0, 0.0), min_points=200, radius_nb_points=60,
        radius=0.03, eps=0.04,
    )
    pipe = GraspPipeline.from_random(cfg)
    cloud = next(iter(ReplayCamera([os.path.join(FIX, "scene_table2obj.ply")])))
    out = pipe(np.asarray(cloud, np.float32))
    assert out is not None, "no clusters found on the fixture scene"
    assert out["clusters"].shape[0] == 2
    assert out["pred_class"].shape == (2,)
    assert out["rotation_deg"].shape == (2, 3)
    assert out["translation"].shape == (2, 3)
    assert out["width"].shape == (2,)

    # cluster centroids match the ground-truth object centroids (order-free)
    got = np.sort(np.stack([c.mean(0) for c in np.asarray(out["clusters"])]), 0)
    want = np.sort(np.array([o["centroid"] for o in _meta()["objects"]]), 0)
    np.testing.assert_allclose(got, want, atol=0.05)


def test_depth_fixture_deprojects_and_clusters():
    """Raw depth image -> pinhole deprojection (reference realsense.py:82-94
    path) -> preprocess: the z-buffered fixture recovers the same two-object
    scene geometry."""
    from pointnet_like_pose_estimation_tpu.pipeline import (
        CameraIntrinsics,
        cluster_point,
        deproject_depth,
        remove_plane,
        remove_radius_outlier,
    )
    from pointnet_like_pose_estimation_tpu.pipeline.preprocess import clip_distance

    intr = CameraIntrinsics.from_json(os.path.join(FIX, "camera.json"))
    depth = np.load(os.path.join(FIX, "depth_scene.npz"))["depth"]
    pts = np.asarray(deproject_depth(depth, intr, flip_yz=True))
    pts = pts[pts[:, 2] < 0]  # drop zero-depth pixels (flip makes depth<0)
    assert len(pts) > 5000

    pts = clip_distance(pts, (-1.0, 0.0), axis=2)
    pts = remove_plane(pts, distance_threshold=0.006, num_iterations=500, seed=0)
    pts = remove_radius_outlier(pts, nb_points=10, radius=0.03)
    clusters = cluster_point(pts, eps=0.035, min_points=60)
    assert clusters is not None
    got = np.sort(clusters[..., :3].mean(axis=1), 0)
    want = np.sort(np.array([o["centroid"] for o in _meta()["objects"]]), 0)
    # depth quantization (1 mm) + z-buffer decimation: looser bound
    np.testing.assert_allclose(got, want, atol=0.08)


def _trained_checkpoints() -> dict | None:
    """Best checkpoints from the training suites (round 3 preferred; the
    round-3 set is COMMITTED so this test runs from a fresh clone)."""
    names = {
        "classifier": ["classification/r3_pointnet2_cls_ssg",
                       "classification/r2_pointnet2_cls_ssg"],
        "rotation": ["pose/r3_rotation", "pose/r2_rotation"],
        "sign": ["pose/r3_sign", "pose/r2_sign"],
        "translation": ["pose/r3_translation_ref", "pose/r2_translation"],
        "width": ["pose/r3_width_ref", "pose/r2_width"],
    }
    out = {}
    for key, subs in names.items():
        for sub in subs:
            path = os.path.join("log", sub, "checkpoints", "best.msgpack")
            if os.path.exists(path):
                out[key] = path
                break
        else:
            return None
    return out


def test_replay_pipeline_with_trained_models():
    """With the round-2 trained checkpoints: predicted classes match the
    fixture ground truth and translations localize the objects."""
    ckpts = _trained_checkpoints()
    if ckpts is None:
        pytest.skip("trained checkpoints not present (run scripts/train_round2.py)")

    from pointnet_like_pose_estimation_tpu.data.generators import CATEGORIES
    from pointnet_like_pose_estimation_tpu.data.io_utils import ReplayCamera
    from pointnet_like_pose_estimation_tpu.pipeline import (
        GraspPipeline,
        PipelineConfig,
    )

    cfg = PipelineConfig(
        clip_range=(-1.0, 0.0), min_points=200, radius_nb_points=60,
        radius=0.03, eps=0.04, classifier="pointnet2_cls_ssg",
    )
    pipe = GraspPipeline.from_checkpoints(cfg, ckpts)
    cloud = next(iter(ReplayCamera([os.path.join(FIX, "scene_table2obj.ply")])))
    out = pipe(np.asarray(cloud, np.float32))
    assert out is not None and out["clusters"].shape[0] == 2

    meta = _meta()["objects"]
    want_cats = sorted(o["category"] for o in meta)
    got_cats = sorted(CATEGORIES[int(c)] for c in out["pred_class"])
    assert got_cats == want_cats, (got_cats, want_cats)

    # pose error bounds: predicted translation localizes each object to
    # within 12 cm per axis of its ground-truth centroid (test metric is
    # ~3 cm/axis in-distribution; the fixture scene adds clustering noise),
    # and the unrotated objects' observable Euler angles stay under 15 deg
    # (z excluded: the cylinder's z-rotation is unobservable by symmetry)
    order_got = np.argsort(out["translation"][:, 0])
    order_want = np.argsort([o["centroid"][0] for o in meta])
    tr = np.asarray(out["translation"])[order_got]
    want_tr = np.array([meta[i]["centroid"] for i in order_want])
    np.testing.assert_allclose(tr, want_tr, atol=0.12)
    rot = np.abs(np.asarray(out["rotation_deg"]))[:, :2]
    assert rot.max() < 15.0, rot
