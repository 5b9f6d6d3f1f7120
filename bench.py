"""Headline benchmark vs the reference's only published numbers.

Baseline (BASELINE.md): rotation-head forward, B=2, N=1024 -> 0.048 s on the
author's GPU (reference model/rotation.py:78). We measure the same forward
(10-channel spliced input, identical architecture) jitted on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": <seconds>, "unit": "s", "vs_baseline": <speedup>}

Set BENCH_FULL=1 for the extended suite (training throughput, FPS kernels,
multi-head pipeline) — details go to stderr.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: compiles over the axon tunnel are minutes;
# cached reloads are seconds
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_ROTATION_FWD_S = 0.048  # model/rotation.py:78


def _time(fn, *args, iters=50):
    jax.block_until_ready(fn(*args))  # compile + warmup
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def headline():
    from pointnet_like_pose_estimation_tpu.train import TrainConfig
    from pointnet_like_pose_estimation_tpu.train.loop import build_state

    cfg = TrainConfig.for_model("rotation", num_points=1024)
    _, model, state = build_state(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x = jnp.ones((2, 1024, 10), jnp.float32)
    fwd = jax.jit(lambda p: model.apply(variables, p, train=False))
    latency = _time(fwd, x)
    print(f"rotation fwd B=2 N=1024: {latency*1e3:.3f} ms", file=sys.stderr)
    return latency


def extended():
    import numpy as np

    from pointnet_like_pose_estimation_tpu.kernels import fps_pallas
    from pointnet_like_pose_estimation_tpu.ops import farthest_point_sample
    from pointnet_like_pose_estimation_tpu.train import TrainConfig, make_train_step
    from pointnet_like_pose_estimation_tpu.train.loop import build_state

    rng = np.random.default_rng(0)
    report = {}

    # FPS kernels
    pts = jnp.asarray(rng.standard_normal((64, 1024, 3)), jnp.float32)
    t_jnp = _time(jax.jit(farthest_point_sample, static_argnums=1), pts, 512)
    t_pal = _time(lambda p: fps_pallas(p, 512), pts)
    report["fps_jnp_b64_ms"] = t_jnp * 1e3
    report["fps_pallas_b64_ms"] = t_pal * 1e3

    # training throughput per model
    for model_name, bs in [("pointnet_cls", 128), ("pointnet2_cls_ssg", 64)]:
        bcfg = TrainConfig.for_model(model_name, num_points=1024, batch_size=bs)
        bspec, _, bstate = build_state(bcfg)
        step = make_train_step(bspec, bcfg)
        batch = {
            "points": jnp.asarray(rng.standard_normal((bs, 1024, 3)), jnp.float32),
            "labels": jnp.asarray(rng.integers(0, 7, bs), jnp.int32),
            "rot": jnp.zeros((bs, 3), jnp.float32),
            "tran": jnp.zeros((bs, 3), jnp.float32),
            "sign": jnp.ones((bs,), jnp.float32),
            "width": jnp.zeros((bs, 1), jnp.float32),
        }
        bstate, m = step(bstate, batch)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            bstate, m = step(bstate, batch)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        report[f"{model_name}_train_clouds_per_s"] = bs / dt

    print(json.dumps(report, indent=2), file=sys.stderr)
    with open("benchmarks_extended.json", "w") as f:
        json.dump(report, f, indent=2)


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    latency = headline()
    print(
        json.dumps(
            {
                "metric": "rotation_head_fwd_latency_b2_n1024",
                "value": round(latency, 6),
                "unit": "s",
                "vs_baseline": round(BASELINE_ROTATION_FWD_S / latency, 2),
            }
        )
    )
    sys.stdout.flush()
    if os.environ.get("BENCH_FULL"):
        extended()


if __name__ == "__main__":
    main()
