"""Smoke tests for the headless visualizers (utils/viz.py)."""

import numpy as np

from pointnet_like_pose_estimation_tpu.utils import viz


def test_plot_cloud_xyz_and_xyzrgb(tmp_path):
    pts = np.random.default_rng(0).normal(size=(128, 3)).astype(np.float32)
    viz.plot_cloud(pts, path=str(tmp_path / "xyz.png"))
    rgb = np.concatenate([pts, np.random.default_rng(1).uniform(size=(128, 3))], axis=1)
    viz.plot_cloud(rgb, path=str(tmp_path / "xyzrgb.png"))
    assert (tmp_path / "xyz.png").stat().st_size > 0
    assert (tmp_path / "xyzrgb.png").stat().st_size > 0


def test_plot_clusters_3d_array_and_list(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(3, 64, 6)).astype(np.float32)
    viz.plot_clusters(arr, path=str(tmp_path / "clusters.png"))
    ragged = [rng.normal(size=(40, 3)), rng.normal(size=(80, 3))]
    viz.plot_clusters(ragged, path=str(tmp_path / "ragged.png"))
    assert (tmp_path / "clusters.png").stat().st_size > 0


def test_plot_rgbd_background_removal(tmp_path):
    rng = np.random.default_rng(0)
    color = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    depth = rng.integers(0, 3000, size=(48, 64), dtype=np.uint16)
    viz.plot_rgbd(color, depth, depth_clip_m=1.5, path=str(tmp_path / "rgbd.png"))
    assert (tmp_path / "rgbd.png").stat().st_size > 0


def test_plot_history(tmp_path):
    history = [
        {"epoch": 0, "train_loss": 1.0, "test_loss": 1.1, "test_instance_acc": 0.3},
        {"epoch": 1, "train_loss": 0.5, "test_loss": 0.6, "test_instance_acc": 0.6},
    ]
    viz.plot_history(history, path=str(tmp_path / "hist.png"))
    assert (tmp_path / "hist.png").stat().st_size > 0


def test_rgbd_stream_headless_fallback(tmp_path):
    """The interactive RGBD viewer degrades to a PNG frame sequence on a
    headless host (viz_interactive parity with realsense.py:112-122)."""
    import numpy as np

    from pointnet_like_pose_estimation_tpu.utils.viz_interactive import RGBDStream

    stream = RGBDStream(out_dir=str(tmp_path), max_frames=2, depth_clip_m=1.0)
    assert not stream.interactive  # no DISPLAY in the test env
    color = np.full((8, 12, 3), 200, np.uint8)
    depth = np.full((8, 12), 500, np.uint16)  # 0.5 m
    depth[:4] = 5000  # 5 m -> background, greyed out
    assert stream.show(color, depth) is True      # frame 1 < max_frames
    assert stream.show(color, depth) is False     # frame 2 hits max_frames
    stream.close()
    frames = sorted(tmp_path.iterdir())
    assert [f.name for f in frames] == ["frame_00001.png", "frame_00002.png"]
    from PIL import Image

    arr = np.asarray(Image.open(frames[0]))
    assert arr.shape == (8, 24, 3)                # side-by-side composition
    assert (arr[:4, :12] == 153).all()            # background greyed


def test_show_cloud_and_clusters_headless(tmp_path):
    import numpy as np

    from pointnet_like_pose_estimation_tpu.utils.viz_interactive import (
        show_cloud,
        show_clusters,
    )

    pts = np.random.default_rng(0).standard_normal((50, 3)).astype(np.float32)
    p1 = show_cloud(pts, title="t", path=str(tmp_path / "c.png"))
    assert p1 and (tmp_path / "c.png").exists()
    p2 = show_clusters([pts, pts + 2.0], path=str(tmp_path / "cl.png"))
    assert p2 and (tmp_path / "cl.png").exists()
