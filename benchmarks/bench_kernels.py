"""Kernel benchmarks: Pallas TPU kernels vs their XLA reference impls, with
speed-of-light context.

Covers the two hot ops of every set-abstraction layer (SURVEY §3.3):

- FPS (kernels/fps.py): sequential over S iterations, batch-row tiled.
  Roofline: each iteration touches (C+1)·B·N f32 in VMEM — the op is
  loop-latency bound, not bandwidth bound, so the metric that matters is
  per-iteration latency.
- ball-query+group (kernels/ball_group.py): HBM traffic lower bound is one
  read of points [B,N,C] + one write of groups [B,S,K,C]; the XLA path adds
  a [B,S,N] distance matrix round-trip and top_k.

Run: python benchmarks/bench_kernels.py  (TPU; slow first compile)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pointnet_like_pose_estimation_tpu.utils import enable_compile_cache


def _time(fn, *args, iters=30):
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    enable_compile_cache()
    from pointnet_like_pose_estimation_tpu.kernels.ball_group import ball_group_pallas
    from pointnet_like_pose_estimation_tpu.kernels.fps import fps_pallas
    from pointnet_like_pose_estimation_tpu.ops import (
        farthest_point_sample,
        index_points,
        query_ball_point,
    )

    report = {}
    key = jax.random.PRNGKey(0)

    # --- FPS ---
    for B, N, S in [(24, 1024, 512), (64, 1024, 512), (64, 4096, 1024)]:
        pts = jax.random.normal(key, (B, N, 3))
        t_x = _time(jax.jit(lambda p: farthest_point_sample(p, S)), pts)
        t_p = _time(jax.jit(lambda p: fps_pallas(p, S)), pts)
        tag = f"fps_b{B}_n{N}_s{S}"
        report[tag] = {
            "xla_ms": round(t_x * 1e3, 3),
            "pallas_ms": round(t_p * 1e3, 3),
            "speedup": round(t_x / t_p, 2),
            "pallas_us_per_iter": round(t_p / S * 1e6, 3),
        }

    # --- ball query + group (+center) ---
    def xla_group(p, c, r, k):
        idx = query_ball_point(r, k, p[..., :3], c)
        return index_points(p, idx).at[..., :3].add(-c[:, :, None, :])

    for B, N, C, S, K, r in [
        (24, 1024, 3, 512, 32, 0.2),    # SSG sa1
        (64, 512, 131, 128, 64, 0.4),   # SSG sa2 (feature-heavy)
        (24, 1024, 10, 512, 128, 0.4),  # MSG large-K scale
    ]:
        p = jax.random.normal(key, (B, N, C))
        c = p[:, :S, :3]
        t_x = _time(jax.jit(lambda p, c: xla_group(p, c, r, K)), p, c)
        t_p = _time(jax.jit(lambda p, c: ball_group_pallas(p, c, r, K, 128, False)), p, c)
        out_bytes = 4 * B * S * K * C
        in_bytes = 4 * B * N * C
        tag = f"ballgroup_b{B}_n{N}_c{C}_s{S}_k{K}"
        report[tag] = {
            "xla_ms": round(t_x * 1e3, 3),
            "pallas_ms": round(t_p * 1e3, 3),
            "speedup": round(t_x / t_p, 2),
            # fraction of the HBM-traffic lower bound achieved (v5e ~819 GB/s)
            "pallas_frac_sol": round((in_bytes + out_bytes) / 819e9 / t_p, 3),
        }

    print(json.dumps(report, indent=2))
    with open(os.path.join(os.path.dirname(__file__), "bench_kernels.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
