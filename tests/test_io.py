"""IO round-trip tests: reference txt layout, PLY, replay camera."""

import numpy as np

from pointnet_like_pose_estimation_tpu.data.io_utils import (
    ReplayCamera,
    load_ply,
    load_reference_sample,
    save_ply,
    save_reference_layout,
)


def test_reference_layout_roundtrip(tmp_path):
    pts = np.random.default_rng(0).standard_normal((100, 3))
    rot = np.array([10.0, -20.0, 30.0])
    tran = np.array([0.1, 0.2, -0.8])
    save_reference_layout(str(tmp_path), "cube", 7, pts, rot, tran)
    assert (tmp_path / "cube" / "cube_0007.txt").exists()
    p, r, t = load_reference_sample(str(tmp_path), "cube", 7)
    np.testing.assert_allclose(p, pts, atol=1e-5)
    np.testing.assert_allclose(r, rot, atol=1e-5)
    np.testing.assert_allclose(t, tran, atol=1e-5)


def test_ply_roundtrip_xyz(tmp_path):
    pts = np.random.default_rng(1).standard_normal((50, 3))
    path = str(tmp_path / "a.ply")
    save_ply(path, pts)
    got = load_ply(path)
    np.testing.assert_allclose(got, pts, atol=1e-5)


def test_ply_roundtrip_rgb(tmp_path):
    rng = np.random.default_rng(2)
    pts = np.column_stack([rng.standard_normal((30, 3)), rng.uniform(size=(30, 3))])
    path = str(tmp_path / "b.ply")
    save_ply(path, pts)
    got = load_ply(path)
    assert got.shape == (30, 6)
    np.testing.assert_allclose(got[:, :3], pts[:, :3], atol=1e-5)
    np.testing.assert_allclose(got[:, 3:], pts[:, 3:], atol=1 / 255 + 1e-6)


def test_replay_camera(tmp_path):
    pts = np.random.default_rng(3).standard_normal((20, 3))
    p1 = str(tmp_path / "f1.ply")
    save_ply(p1, pts)
    cam = ReplayCamera([p1])
    frames = list(cam)
    assert len(frames) == 1
    np.testing.assert_allclose(frames[0], pts, atol=1e-5)
    assert cam.get_cloud() is None
