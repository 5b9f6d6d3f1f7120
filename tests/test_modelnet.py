"""ModelNet loader tests on a synthetic fixture tree."""

import numpy as np
import pytest

from pointnet_like_pose_estimation_tpu.data.modelnet import (
    ModelNetDataset,
    pc_normalize,
)


@pytest.fixture(scope="module")
def modelnet_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("modelnet")
    rng = np.random.default_rng(0)
    shapes = ["bed", "night_stand"]
    (root / "modelnet10_shape_names.txt").write_text("\n".join(shapes) + "\n")
    train_ids, test_ids = [], []
    for shape in shapes:
        (root / shape).mkdir()
        for i in range(1, 4):
            sid = f"{shape}_{i:04d}"
            pts = rng.standard_normal((200, 6)).astype(np.float32)
            np.savetxt(root / shape / f"{sid}.txt", pts, delimiter=",")
            (train_ids if i < 3 else test_ids).append(sid)
    (root / "modelnet10_train.txt").write_text("\n".join(train_ids) + "\n")
    (root / "modelnet10_test.txt").write_text("\n".join(test_ids) + "\n")
    return str(root)


def test_pc_normalize():
    pc = np.random.default_rng(1).standard_normal((50, 3)) * 5 + 3
    out = pc_normalize(pc)
    np.testing.assert_allclose(out.mean(0), 0, atol=1e-6)
    np.testing.assert_allclose(np.sqrt((out**2).sum(1)).max(), 1.0, rtol=1e-6)


def test_modelnet_loads_and_caches(modelnet_root):
    ds = ModelNetDataset(modelnet_root, 10, "train", npoints=64)
    assert ds.points.shape == (4, 64, 3)
    assert set(ds.labels.tolist()) == {0, 1}
    # second load hits the cache
    ds2 = ModelNetDataset(modelnet_root, 10, "train", npoints=64)
    np.testing.assert_array_equal(ds.points, ds2.points)


def test_modelnet_uniform_fps_with_normals(modelnet_root):
    ds = ModelNetDataset(
        modelnet_root, 10, "test", npoints=32, uniform=True, use_normals=True, cache=False
    )
    assert ds.points.shape == (2, 32, 6)
    # normalized xyz
    r = np.sqrt((ds.points[..., :3] ** 2).sum(-1)).max(-1)
    np.testing.assert_allclose(r, 1.0, rtol=1e-4)


def test_modelnet_as_pose_dataset(modelnet_root):
    ds = ModelNetDataset(modelnet_root, 10, "train", npoints=64).as_pose_dataset()
    assert len(ds) == 4 and ds.points.shape[-1] == 3


def test_realsense_requires_library():
    from pointnet_like_pose_estimation_tpu.pipeline.camera import RealSenseCamera

    with pytest.raises(RuntimeError, match="pyrealsense2"):
        RealSenseCamera()
