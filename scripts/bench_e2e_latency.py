"""Full scene->grasp latency (VERDICT r4 #3/missing #3): wall time of
``GraspPipeline.__call__`` — the loop the reference intended to run at the
RealSense's 30 fps capture rate (camera_test/camera.json, 640x480@30;
point_collect/test.py:5-16) but never assembled.

Scenes:
  fixture     the committed replay fixture (tests/fixtures/scene_table2obj.ply)
  frame       examples/e2e_demo.build_scene() — ~28k-point synthetic frame
  frame300k   the same scene with the table densified to ~300k points, the
              raw scale of a full 640x480 deprojected frame

Splits per scene: preprocess stages (clip / plane RANSAC / radius outlier /
DBSCAN+FPS cluster), fused 5-model infer, total. DBSCAN is measured with
the native C++ grid-hash kernel AND the numpy fallback (fallback only at
fixture scale — its per-point Python loop takes minutes at 300k).

Latency uses randomly-initialized models: identical compute graph to the
trained checkpoints (weights don't change the program), so the numbers
transfer to log/e2e_demo_trained.txt's run.

Writes log/e2e_latency.json (merge-update). Median of REPS repeats after a
warmup call (the infer program compiles once per cluster-count K).
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
from pointnet_like_pose_estimation_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()
import numpy as np  # noqa: E402

from pointnet_like_pose_estimation_tpu.pipeline import (  # noqa: E402
    GraspPipeline,
    PipelineConfig,
    preprocess as pp,
)

OUT = "log/e2e_latency.json"
REPS = int(os.environ.get("PLPE_E2E_REPS", 10))
FRAME_BUDGET_MS = 1000.0 / 30.0  # the reference's capture rate


def fixture_scene():
    from pointnet_like_pose_estimation_tpu.data.io_utils import ReplayCamera

    path = os.path.join("tests", "fixtures", "scene_table2obj.ply")
    return np.asarray(next(iter(ReplayCamera([path]))), np.float32)


def frame_scene(n_plane=20000):
    sys.path.insert(0, "examples")
    import e2e_demo

    if n_plane == 20000:
        return e2e_demo.build_scene()
    # densified table to full-frame raw scale
    rng = np.random.default_rng(0)
    base = e2e_demo.build_scene()
    extra = np.column_stack([
        rng.uniform(-0.5, 0.5, n_plane - 20000),
        rng.uniform(-0.5, 0.5, n_plane - 20000),
        np.full(n_plane - 20000, -0.7) + rng.normal(0, 0.0015, n_plane - 20000),
    ]).astype(np.float32)
    return np.concatenate([base, extra])


def pipe_for(scene_name):
    if scene_name == "fixture":
        cfg = PipelineConfig(
            clip_range=(-1.0, 0.0), min_points=200, radius_nb_points=60,
            radius=0.03, eps=0.04,
        )
    else:
        cfg = PipelineConfig(clip_range=(-1.0, 0.0), min_points=500, eps=0.03)
    return GraspPipeline.from_random(cfg)


def timed(fn, reps=REPS):
    fn()  # warmup (compiles)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return {"median_ms": statistics.median(ts), "min_ms": min(ts),
            "max_ms": max(ts), "reps": reps}


def stage_split(pipe, pts):
    cfg = pipe.cfg
    out = {}
    clipped = pp.clip_distance(pts, cfg.clip_range, cfg.clip_axis)
    out["clip"] = timed(lambda: pp.clip_distance(pts, cfg.clip_range, cfg.clip_axis))
    planeless = pp.remove_plane(clipped, distance_threshold=cfg.plane_threshold,
                                num_iterations=cfg.plane_iterations)
    out["plane_ransac"] = timed(lambda: pp.remove_plane(
        clipped, distance_threshold=cfg.plane_threshold,
        num_iterations=cfg.plane_iterations))
    cleaned = pp.remove_radius_outlier(planeless, cfg.radius_nb_points, cfg.radius)
    out["radius_outlier"] = timed(lambda: pp.remove_radius_outlier(
        planeless, cfg.radius_nb_points, cfg.radius))
    out["clean_fused"] = timed(lambda: pp.clean_scene(
        clipped, plane_threshold=cfg.plane_threshold,
        num_iterations=cfg.plane_iterations,
        radius_nb_points=cfg.radius_nb_points, radius=cfg.radius))
    out["cluster_native"] = timed(lambda: pp.cluster_point(
        cleaned, cfg.eps, cfg.min_points))
    out["n_after_clean"] = int(len(cleaned))
    return out, cleaned


def main():
    out = {}
    if os.path.exists(OUT):
        out = json.load(open(OUT))
    scenes = [("fixture", fixture_scene), ("frame", frame_scene),
              ("frame300k", lambda: frame_scene(292000))]
    only = os.environ.get("PLPE_E2E_ONLY", "")
    for name, build in scenes:
        if only and only not in name:
            continue
        row = out.setdefault(name, {})
        pts = build()
        row["n_points_raw"] = int(len(pts))
        pipe = pipe_for(name)
        if "total" not in row:
            res = pipe(pts)
            row["n_clusters"] = int(res["clusters"].shape[0]) if res else 0
            row["total"] = timed(lambda: pipe(pts))
            row["total"]["vs_30fps_budget"] = round(
                row["total"]["median_ms"] / FRAME_BUDGET_MS, 3)
            json.dump(out, open(OUT, "w"), indent=2)
            print(name, "total", row["total"], file=sys.stderr, flush=True)
        if "stages" not in row:
            row["stages"], cleaned = stage_split(pipe, pts)
            clusters = pipe.preprocess(pts)
            if clusters is not None:
                row["infer"] = timed(lambda: pipe.infer_clusters(clusters))
            # numpy DBSCAN fallback: fixture scale only (Python loop);
            # isolates the dbscan call itself (native row below does too)
            row["stages"]["dbscan_native_only"] = timed(
                lambda: pp.dbscan(cleaned, pipe.cfg.eps, pipe.cfg.min_points))
            if name == "fixture":
                row["stages"]["dbscan_numpy_fallback"] = timed(
                    lambda: pp.dbscan(cleaned, pipe.cfg.eps,
                                      pipe.cfg.min_points, use_native=False),
                    reps=3)
            json.dump(out, open(OUT, "w"), indent=2)
            print(name, "stages", row["stages"], file=sys.stderr, flush=True)
        if "stream" not in row:
            # pipelined stream(): sustained frames/s with host/device overlap
            n_frames = 12
            list(pipe.stream([pts] * 2))            # warm the compiled programs
            t0 = time.perf_counter()
            results = list(pipe.stream([pts] * n_frames))
            span = time.perf_counter() - t0
            assert all(r is not None for r in results)
            row["stream"] = {
                "frames": n_frames,
                "sustained_ms_per_frame": round(span / n_frames * 1e3, 3),
                "sustained_fps": round(n_frames / span, 2),
                "vs_sequential_total": round(
                    row["total"]["median_ms"] / (span / n_frames * 1e3), 3),
            }
            json.dump(out, open(OUT, "w"), indent=2)
            print(name, "stream", row["stream"], file=sys.stderr, flush=True)
    json.dump(out, open(OUT, "w"), indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
