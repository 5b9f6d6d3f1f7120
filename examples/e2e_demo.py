"""End-to-end demo: synthetic capture -> preprocess -> classify -> grasp.

Builds the scene the reference intended (README.md:10-28) without hardware:
a synthetic table with two generated objects, run through the full
pipeline — distance cut, RANSAC table removal, outlier rejection, DBSCAN,
and the fused classify->pose program — printing one grasp per detected
object.

Run: python examples/e2e_demo.py  [--checkpoints '{"classifier": ...}']
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor JAX_PLATFORMS=cpu even though the image pins the tunneled-TPU
# platform programmatically (the pin must land before backend init)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def build_scene(seed=0):
    """Table + two objects in the TRAINING world convention (the RealSense
    flip makes z negative, realsense.py:90; the generators place objects at
    x,y in ±0.5, z in [-1, -0.6], build_data.py:62-174): camera at the
    origin looking down -z, table plane at z=-0.7, objects in front of it."""
    from pointnet_like_pose_estimation_tpu.data import generators

    rng = np.random.default_rng(seed)
    n_plane = 20000
    table = np.column_stack(
        [
            rng.uniform(-0.5, 0.5, n_plane),
            rng.uniform(-0.5, 0.5, n_plane),
            np.full(n_plane, -0.7) + rng.normal(0, 0.0015, n_plane),
        ]
    )
    objects = []
    for cat, pos in [("cube", (-0.15, 0.1)), ("cylinder", (0.2, -0.05))]:
        p = generators.sample_category_params(cat, rng)
        # single-view capture sim, like every training cloud (clip_half keeps
        # the camera-facing upper-z half, Cube.py:74-79)
        dense = generators.clip_half(generators.dense_surface(p))
        dense = dense[rng.choice(len(dense), min(4000, len(dense)), replace=False)]
        dense = dense + np.array([pos[0], pos[1], -0.66])  # in front of table
        objects.append(dense)
    scatter = rng.uniform(-1, 1, (60, 3)) + [0, 0, -1.5]  # sparse far outliers
    return np.concatenate([table, *objects, scatter]).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoints", default=None, help="json dict name->path")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from pointnet_like_pose_estimation_tpu.data.generators import CATEGORIES
    from pointnet_like_pose_estimation_tpu.pipeline import GraspPipeline, PipelineConfig
    from pointnet_like_pose_estimation_tpu.utils import enable_compile_cache

    enable_compile_cache()
    cfg = PipelineConfig(
        clip_range=(-1.0, 0.0),
        min_points=300,
        radius_nb_points=60,
        radius=0.03,
        eps=0.03,
    )
    if args.checkpoints:
        pipe = GraspPipeline.from_checkpoints(cfg, json.loads(args.checkpoints))
    else:
        print("(no checkpoints given — using randomly initialized models)")
        pipe = GraspPipeline.from_random(cfg)

    scene = build_scene(args.seed)
    print(f"scene: {len(scene)} points")
    out = pipe(scene)
    if out is None:
        print("no clusters found")
        return
    K = out["clusters"].shape[0]
    print(f"clusters: {K}")
    for k in range(K):
        print(
            f"  object {k}: class={CATEGORIES[int(out['pred_class'][k])]}"
            f" rot(deg)={np.round(out['rotation_deg'][k], 1).tolist()}"
            f" t(m)={np.round(out['translation'][k], 3).tolist()}"
            f" width={out['width'][k]:.3f}"
        )


if __name__ == "__main__":
    main()
