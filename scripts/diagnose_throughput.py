"""Diagnose the B=256 train-step throughput cliff (VERDICT r2 weak #1).

Round-2 headline: 243.6 ms/step at B=256 (1,051 clouds/s) vs 5.5 ms/step at
B=8 (1,454 clouds/s) — per-cloud throughput DROPS 28% with batch. This script
decomposes the pn2_ssg train step on the real chip so the cliff is attributed
to a component, not guessed at (prime suspect per VERDICT: the FPS kernel's
single sequential grid program, kernels/fps.py).

Writes log/throughput_diagnosis.json with per-component times at several
batch sizes:
  - fps_pallas / fps XLA alone (SA1 shape: N=1024 -> S=512)
  - ball_query_pallas alone (SA1: S=512, K=32, r=0.2)
  - model forward (inference)
  - full train step (fwd+bwd+Adam)
"""

import json
import os
import sys
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

from pointnet_like_pose_estimation_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pointnet_like_pose_estimation_tpu.kernels import (  # noqa: E402
    ball_query_pallas,
    fps_pallas,
)
from pointnet_like_pose_estimation_tpu.kernels import flags as kflags  # noqa: E402
from pointnet_like_pose_estimation_tpu.ops import (  # noqa: E402
    farthest_point_sample,
    query_ball_point,
)
from pointnet_like_pose_estimation_tpu.train import (  # noqa: E402
    TrainConfig,
    make_train_step,
)
from pointnet_like_pose_estimation_tpu.train.loop import build_state  # noqa: E402


def timeit(fn, *args):
    """Sustained timing — block-based short loops under-measure over the
    tunneled TPU (round-4 finding, utils/profiling.sustained_time)."""
    from pointnet_like_pose_estimation_tpu.utils import sustained_time

    return sustained_time(fn, *args, min_seconds=2.0)


def fake_batch(rng, bs, n=1024):
    return {
        "points": jnp.asarray(rng.standard_normal((bs, n, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 7, bs), jnp.int32),
        "rot": jnp.zeros((bs, 3), jnp.float32),
        "tran": jnp.zeros((bs, 3), jnp.float32),
        "sign": jnp.ones((bs,), jnp.float32),
        "width": jnp.zeros((bs, 1), jnp.float32),
    }


def main():
    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0])}
    batches = [int(b) for b in os.environ.get(
        "PLPE_DIAG_BATCHES", "8,32,128,256").split(",")]

    for bs in batches:
        row = {}
        pts = jnp.asarray(rng.standard_normal((bs, 1024, 3)), jnp.float32)

        # FPS kernel alone (SA1 shape)
        t = timeit(lambda p: fps_pallas(p, 512), pts)
        row["fps_pallas_ms"] = t * 1e3
        row["fps_pallas_us_per_iter"] = t / 512 * 1e6
        # FPS XLA fallback
        kflags.set_impls(fps="xla")
        try:
            t = timeit(jax.jit(farthest_point_sample, static_argnums=1), pts, 512)
        finally:
            kflags.set_impls(fps="auto")
        row["fps_xla_ms"] = t * 1e3

        # ball query kernel alone (SA1: S=512, K=32)
        cent = pts[:, :512, :]
        t = timeit(lambda p, c: ball_query_pallas(p, c, 0.2, 32), pts, cent)
        row["ball_query_pallas_ms"] = t * 1e3
        kflags.set_impls(grouping="xla")
        try:
            t = timeit(
                jax.jit(lambda p, c: query_ball_point(0.2, 32, p, c)), pts, cent
            )
        finally:
            kflags.set_impls(grouping="auto")
        row["ball_query_xla_ms"] = t * 1e3

        # SA2-shaped ball query (S=128 over N=512, K=64)
        pts2 = pts[:, :512, :]
        cent2 = pts[:, :128, :]
        t = timeit(lambda p, c: ball_query_pallas(p, c, 0.4, 64), pts2, cent2)
        row["ball_query2_pallas_ms"] = t * 1e3

        # model forward / full train step
        cfg = TrainConfig.for_model(
            "pointnet2_cls_ssg", num_points=1024, batch_size=bs
        )
        spec, model, state = build_state(cfg)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fwd = jax.jit(lambda p: model.apply(variables, p, train=False))
        t = timeit(fwd, pts)
        row["pn2_ssg_fwd_ms"] = t * 1e3

        step = make_train_step(spec, cfg)
        batch = fake_batch(rng, bs)
        from pointnet_like_pose_estimation_tpu.utils import sustained_step_time

        t, state = sustained_step_time(step, state, batch, min_seconds=2.0)
        row["train_step_ms"] = t * 1e3
        row["train_clouds_per_s"] = bs / t

        out[f"b{bs}"] = row
        print(f"B={bs}: " + json.dumps(row), file=sys.stderr, flush=True)

    os.makedirs("log", exist_ok=True)
    with open("log/throughput_diagnosis.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
