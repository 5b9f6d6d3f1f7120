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


def test_stl_roundtrip_and_sampling(tmp_path):
    from pointnet_like_pose_estimation_tpu.data.stl import (
        load_stl,
        sample_mesh_surface,
        save_stl,
    )

    # unit cube as 12 triangles
    v = np.array(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], dtype=float
    )
    faces = [
        (0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),  # x faces
        (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),  # y faces
        (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),  # z faces
    ]
    tris = np.stack([v[list(f)] for f in faces])
    path = str(tmp_path / "cube.stl")
    save_stl(path, tris)
    got = load_stl(path)
    assert got.shape == (12, 3, 3)
    np.testing.assert_allclose(got, tris, atol=1e-6)

    pts = sample_mesh_surface(got, 500, np.random.default_rng(0))
    assert pts.shape == (500, 3)
    # all sampled points lie on the cube surface
    on_face = np.zeros(500, dtype=bool)
    for ax in range(3):
        on_face |= np.isclose(pts[:, ax], 0.0, atol=1e-9) | np.isclose(
            pts[:, ax], 1.0, atol=1e-9
        )
    assert on_face.all()
    assert (pts >= -1e-9).all() and (pts <= 1 + 1e-9).all()


def test_stl_ascii(tmp_path):
    from pointnet_like_pose_estimation_tpu.data.stl import load_stl

    ascii_stl = """solid test
facet normal 0 0 1
 outer loop
  vertex 0 0 0
  vertex 1 0 0
  vertex 0 1 0
 endloop
endfacet
endsolid test
"""
    p = tmp_path / "tri.stl"
    p.write_text(ascii_stl)
    tris = load_stl(str(p))
    assert tris.shape == (1, 3, 3)
    np.testing.assert_allclose(tris[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]])


def test_native_csv_loader_matches_numpy(tmp_path):
    """pc_load_csv_files parses the reference txt layout identically to
    numpy; unreadable files are flagged with -1 rows."""
    from pointnet_like_pose_estimation_tpu.data.io_utils import save_reference_layout
    from pointnet_like_pose_estimation_tpu.pipeline import native_dbscan

    rng = np.random.default_rng(3)
    for i in range(1, 6):
        save_reference_layout(
            str(tmp_path), "cube", i, rng.standard_normal((64, 3)), [1, 2, 3], [4, 5, 6]
        )
    paths = [str(tmp_path / "cube" / f"cube_{i:04d}.txt") for i in range(1, 6)]
    res = native_dbscan.load_csv_files(paths, 64, 3)
    if res is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    vals, rows = res
    assert (rows == 64).all()
    ref = np.stack([np.loadtxt(p, delimiter=",", dtype=np.float32) for p in paths])
    np.testing.assert_allclose(vals, ref, atol=1e-6)
    vals2, rows2 = native_dbscan.load_csv_files(paths + [str(tmp_path / "nope.txt")], 64, 3)
    assert rows2[-1] == -1


def test_load_reference_layout_dataset(tmp_path):
    """End-to-end: txt tree -> PoseDataset with the reference split ratio,
    random-sample-to-N, and the sign convention (ModelDataLoader.py:86-89)."""
    from pointnet_like_pose_estimation_tpu.data import load_reference_layout
    from pointnet_like_pose_estimation_tpu.data.io_utils import save_reference_layout

    rng = np.random.default_rng(4)
    for cat in ["cube", "cylinder"]:
        for i in range(1, 9):
            save_reference_layout(
                str(tmp_path), cat, i, rng.standard_normal((128, 3)),
                rot=[10.0, -5.0, -30.0 if i % 2 else 20.0], tran=[0.1, 0.2, 0.3],
            )
    train = load_reference_layout(
        str(tmp_path), "train", num_points=32, categories=["cube", "cylinder"]
    )
    test = load_reference_layout(
        str(tmp_path), "test", num_points=32, categories=["cube", "cylinder"]
    )
    # 6001/8000 ratio on 8 files/class -> 6 train / 2 test per class
    assert len(train) == 12 and len(test) == 4
    assert train.points.shape == (12, 32, 3)
    assert set(np.unique(train.labels)) == {0, 1}
    assert (train.rot[:, 2] >= 0).all()
    assert set(np.unique(train.sign)) <= {-1.0, 1.0}
