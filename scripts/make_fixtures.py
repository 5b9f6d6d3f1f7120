"""Generate the committed replay fixtures (VERDICT r1 item 6).

The reference ships capture stand-ins (camera_test/night_stand.txt, bed.txt,
camera.json) so the perception path can run without a RealSense. Our
equivalents, deterministic and regenerable:

- tests/fixtures/scene_table2obj.ply — the e2e_demo synthetic scene (table
  plane + cube + cylinder + far outliers, 18k points); drives
  ReplayCamera -> preprocess -> GraspPipeline.
- tests/fixtures/depth_scene.npz — the same scene z-buffered into a raw
  depth image (mm, uint16) with the reference camera.json intrinsics
  (424x240 to keep the file small); drives deproject_depth -> preprocess.
- tests/fixtures/camera.json — intrinsics in the reference's camera.json
  schema (point_collect/realsense.py:28-54 reader conventions).
- tests/fixtures/scene_meta.json — ground-truth object categories/centroids
  for assertion bounds.

Run: python scripts/make_fixtures.py (CPU-safe, seconds).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")
W, H = 424, 240
FX = FY = 212.0
PPX, PPY = W / 2.0, H / 2.0


def build_scene(rng):
    """e2e_demo scene, TRAINING world convention (RealSense flip -> negative
    z, realsense.py:90; generators place objects at z in [-1, -0.6]): camera
    at the origin looking down -z, table at z=-0.7, objects in front."""
    from pointnet_like_pose_estimation_tpu.data import generators

    n_plane = 12000
    table = np.column_stack([
        rng.uniform(-0.5, 0.5, n_plane),
        rng.uniform(-0.5, 0.5, n_plane),
        np.full(n_plane, -0.7) + rng.normal(0, 0.0015, n_plane),
    ])
    objects, meta = [], []
    for cat, pos in [("cube", (-0.15, 0.1)), ("cylinder", (0.2, -0.05))]:
        p = generators.sample_category_params(cat, rng)
        # single-view capture sim, like every training cloud (clip_half keeps
        # the camera-facing upper-z half, Cube.py:74-79)
        dense = generators.clip_half(generators.dense_surface(p))
        dense = dense[rng.choice(len(dense), min(3000, len(dense)), replace=False)]
        dense = dense + np.array([pos[0], pos[1], -0.66])
        objects.append(dense)
        meta.append({
            "category": cat,
            "centroid": np.mean(dense, axis=0).round(4).tolist(),
            "num_points": int(len(dense)),
        })
    scatter = rng.uniform(-1, 1, (60, 3)) + [0, 0, -1.5]
    scene = np.concatenate([table, *objects, scatter]).astype(np.float32)
    return scene, meta


def zbuffer_depth(scene):
    """Project the scene into a raw uint16 depth image (mm), pinhole model —
    the exact inverse of pipeline.deproject_depth(flip_yz=True): camera at
    the origin looking down -z_world (x_cam = x, y_cam = -y, z_cam = -z)."""
    x, y, z = scene[:, 0], -scene[:, 1], -scene[:, 2]
    keep = z > 0.05
    x, y, z = x[keep], y[keep], z[keep]
    u = np.round(x * FX / z + PPX).astype(np.int64)
    v = np.round(y * FY / z + PPY).astype(np.int64)
    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    u, v, z = u[ok], v[ok], z[ok]
    depth = np.full((H, W), np.inf, np.float64)
    np.minimum.at(depth, (v, u), z)  # z-buffer: nearest surface wins
    depth[~np.isfinite(depth)] = 0.0
    return np.round(depth * 1000.0).astype(np.uint16)  # mm


def main():
    from pointnet_like_pose_estimation_tpu.data.io_utils import save_ply

    os.makedirs(FIX, exist_ok=True)
    rng = np.random.default_rng(0)
    scene, meta = build_scene(rng)
    save_ply(os.path.join(FIX, "scene_table2obj.ply"), scene)

    depth = zbuffer_depth(scene)
    np.savez_compressed(os.path.join(FIX, "depth_scene.npz"), depth=depth)
    with open(os.path.join(FIX, "camera.json"), "w") as f:
        json.dump({
            "width": W, "height": H, "fps": 30,
            "depth_fx": FX, "depth_fy": FY, "depth_ppx": PPX, "depth_ppy": PPY,
            "color_fx": FX, "color_fy": FY, "color_ppx": PPX, "color_ppy": PPY,
        }, f, indent=2)
    with open(os.path.join(FIX, "scene_meta.json"), "w") as f:
        json.dump({"objects": meta, "table_z": -0.7, "seed": 0}, f, indent=2)
    print(f"wrote fixtures to {FIX}: ply={len(scene)} pts, depth={depth.shape}, "
          f"{int((depth > 0).sum())} valid px")


if __name__ == "__main__":
    main()
