"""Headline benchmark vs the reference's only published numbers.

Baseline (BASELINE.md): rotation-head forward, B=2, N=1024 -> 0.048 s on the
author's GPU (reference model/rotation.py:78). We measure the same forward
(10-channel spliced input, identical architecture) jitted on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": <seconds>, "unit": "s", "vs_baseline": <speedup>}
Extra detail (train throughput) goes to stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_ROTATION_FWD_S = 0.048  # model/rotation.py:78


def _time(fn, *args, iters=50):
    jax.block_until_ready(fn(*args))  # compile + warmup
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from pointnet_like_pose_estimation_tpu.models import get_model_spec
    from pointnet_like_pose_estimation_tpu.train import TrainConfig, make_train_step
    from pointnet_like_pose_estimation_tpu.train.loop import build_state

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # --- headline: rotation head forward, B=2, N=1024 (baseline setup) ---
    cfg = TrainConfig.for_model("rotation", num_points=1024)
    spec, model, state = build_state(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x = jnp.ones((2, 1024, 10), jnp.float32)
    fwd = jax.jit(lambda p: model.apply(variables, p, train=False))
    latency = _time(fwd, x)
    print(f"rotation fwd B=2 N=1024: {latency*1e3:.3f} ms", file=sys.stderr)

    # --- secondary: pointnet2_cls_ssg training throughput, 1 chip ---
    try:
        bcfg = TrainConfig(model="pointnet2_cls_ssg", num_points=1024, batch_size=64)
        bspec, bmodel, bstate = build_state(bcfg)
        step = make_train_step(bspec, bcfg)
        import numpy as np

        rng = np.random.default_rng(0)
        batch = {
            "points": jnp.asarray(rng.standard_normal((64, 1024, 3)), jnp.float32),
            "labels": jnp.asarray(rng.integers(0, 7, 64), jnp.int32),
            "rot": jnp.zeros((64, 3), jnp.float32),
            "tran": jnp.zeros((64, 3), jnp.float32),
            "sign": jnp.ones((64,), jnp.float32),
            "width": jnp.zeros((64, 1), jnp.float32),
        }
        bstate, m = step(bstate, batch)  # compile
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            bstate, m = step(bstate, batch)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / iters
        print(
            f"pn2_ssg train step B=64: {dt*1e3:.1f} ms = {64/dt:.0f} clouds/s/chip",
            file=sys.stderr,
        )
    except Exception as e:  # secondary metric must not kill the headline
        print(f"train-throughput bench failed: {e}", file=sys.stderr)

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


if __name__ == "__main__":
    main()
