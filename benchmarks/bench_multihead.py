"""Multi-head pose inference latency: fused XLA program vs sequential calls.

Reference setup: mutilthreading/predict_test.py:41-67 runs the 4 pose heads
(rotation, sign, translation, width) in Python threads on one GPU, B=3,
N=10240. Here the same four heads run (a) as one fused jitted program
(pipeline/infer.py design) and (b) as four separate jitted calls dispatched
back-to-back — showing what the reference's thread concurrency becomes on
TPU.

Run: python benchmarks/bench_multihead.py  (TPU; slow first compile)
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


def main(B=3, N=10240):
    enable_compile_cache()
    from pointnet_like_pose_estimation_tpu.train import TrainConfig
    from pointnet_like_pose_estimation_tpu.train.loop import build_state

    heads = {}
    for name in ("rotation", "sign", "translation", "width"):
        cfg = TrainConfig.for_model(name, num_points=N)
        _, model, state = build_state(cfg)
        heads[name] = (model, {"params": state.params, "batch_stats": state.batch_stats})

    x = jnp.ones((B, N, 10), jnp.float32)
    mean = jnp.zeros((B, 3), jnp.float32)

    def run_head(name, *args):
        model, variables = heads[name]
        return model.apply(variables, *args, train=False)

    @jax.jit
    def fused(x, mean):
        return (
            run_head("rotation", x),
            run_head("sign", x),
            run_head("translation", x, mean),
            run_head("width", x),
        )

    singles = {
        "rotation": jax.jit(lambda x: run_head("rotation", x)),
        "sign": jax.jit(lambda x: run_head("sign", x)),
        "translation": jax.jit(lambda x, m: run_head("translation", x, m)),
        "width": jax.jit(lambda x: run_head("width", x)),
    }

    def sequential(x, mean):
        return (
            singles["rotation"](x),
            singles["sign"](x),
            singles["translation"](x, mean),
            singles["width"](x),
        )

    t_fused = _time(fused, x, mean)
    t_seq = _time(sequential, x, mean)
    report = {
        "B": B,
        "N": N,
        "fused_4head_ms": t_fused * 1e3,
        "sequential_4head_ms": t_seq * 1e3,
        "fused_vs_sequential": t_seq / t_fused,
        "device": str(jax.devices()[0]),
        "num_devices": len(jax.devices()),
    }

    # MPMD fan-out (one head per device; on a single chip it degrades to the
    # async-dispatch pipeline — the reference's 4-GPU-thread analog)
    from pointnet_like_pose_estimation_tpu.parallel import MultiHeadParallel

    cfg = TrainConfig.for_model("pointnet2_cls_ssg", num_points=N)
    _, cls_model, cls_state = build_state(cfg)
    models = dict(heads)
    models["classifier"] = (
        cls_model,
        {"params": cls_state.params, "batch_stats": cls_state.batch_stats},
    )
    mh = MultiHeadParallel(models, num_classes=7)
    xyz = jnp.ones((B, N, 3), jnp.float32)
    t_mpmd = _time(lambda a: mh(a), xyz)
    report["mpmd_5model_ms"] = t_mpmd * 1e3
    print(json.dumps(report, indent=2))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_multihead.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    return report


if __name__ == "__main__":
    main()
