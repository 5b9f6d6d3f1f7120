"""Round-5 perf closure on the real chip (VERDICT r4 #3/#4/#5):

(a) CHUNKED gather-VJP A/B — the K-chunked segment-sum GEMM
    (ops/geometry._chunked_segment_sum) vs the native scatter at the two
    shapes where round 4's whole-one-hot form could not run (SSG B=256,
    MSG B=24 — transient > 1.5 GB budget), plus SSG B=24 as a no-regression
    control for the unchanged single-GEMM path.
(b) FINAL-dispatch verification — the SHIPPED ``auto`` rule (Pallas default
    + single-scale-only _BALLQUERY_XLA_WINS exceptions, MSG bypassing the
    table via multi_scale=True) vs forced-Pallas at every measured shape.
(c) Headline pin — >= 5 sustained repeats of the B=8 train step (f32 and
    bf16), median + spread, resolving the committed 1,844 vs driver 2,137
    discrepancy with variance the reader can see.

All rows are FULL jitted train steps under the sustained protocol
(utils/profiling.sustained_step_time). Writes log/ab_round5.json
(merge-update, resumable).
"""
import json
import os
import statistics
import sys

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
from pointnet_like_pose_estimation_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pointnet_like_pose_estimation_tpu.kernels import flags as kflags  # noqa: E402
from pointnet_like_pose_estimation_tpu.ops import geometry  # noqa: E402
from pointnet_like_pose_estimation_tpu.train import (  # noqa: E402
    TrainConfig,
    make_train_step,
)
from pointnet_like_pose_estimation_tpu.train.loop import build_state  # noqa: E402
from pointnet_like_pose_estimation_tpu.utils import (  # noqa: E402
    sustained_step_time as _sst,
)

OUT = "log/ab_round5.json"


def _batch(rng, bs, n=1024):
    return {
        "points": jnp.asarray(rng.standard_normal((bs, n, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 7, bs), jnp.int32),
        "rot": jnp.zeros((bs, 3), jnp.float32),
        "tran": jnp.zeros((bs, 3), jnp.float32),
        "sign": jnp.ones((bs,), jnp.float32),
        "width": jnp.zeros((bs, 1), jnp.float32),
    }


def step_ms(model, bs, *, dtype="float32", min_seconds=2.0):
    rng = np.random.default_rng(0)
    cfg = TrainConfig.for_model(model, num_points=1024, batch_size=bs, dtype=dtype)
    spec, _, state = build_state(cfg)
    step = make_train_step(spec, cfg)
    t, _ = _sst(step, state, _batch(rng, bs), min_seconds=min_seconds)
    return t * 1e3


def _load():
    return json.load(open(OUT)) if os.path.exists(OUT) else {}


def _save(out):
    os.makedirs("log", exist_ok=True)
    json.dump(out, open(OUT, "w"), indent=2)


def main():
    out = _load()
    only = os.environ.get("PLPE_AB_ONLY", "")

    # ---- (a) chunked gather VJP ----
    for model, bs in [("pointnet2_cls_ssg", 256), ("rotation_msg", 24),
                      ("pointnet2_cls_ssg", 24)]:
        name = f"{model}_b{bs}"
        if only and only not in name:
            continue
        row = out.setdefault(name, {})
        kflags.set_impls(grouping="pallas", fps="pallas")
        for vjp, key in [("scatter", "pallas_scatter_ms"),
                         ("auto", "pallas_matmul_chunked_ms")]:
            if key in row:
                continue
            geometry._GATHER_VJP = vjp
            row[key] = step_ms(model, bs)
            print(f"{name} {key}: {row[key]:.2f} ms", file=sys.stderr, flush=True)
            _save(out)
        geometry._GATHER_VJP = "auto"

    # ---- (b) shipped-auto dispatch verification ----
    geometry._GATHER_VJP = "auto"
    for model, bs in [("pointnet2_cls_ssg", 8), ("pointnet2_cls_ssg", 24),
                      ("pointnet2_cls_ssg", 256), ("rotation_msg", 24)]:
        name = f"{model}_b{bs}"
        if only and only not in name:
            continue
        row = out.setdefault(name, {})
        for impls, key in [(("auto", "auto"), "shipped_auto_ms"),
                           (("pallas", "pallas"), "forced_pallas_ms")]:
            if key in row:
                continue
            kflags.set_impls(grouping=impls[0], fps=impls[1])
            row[key] = step_ms(model, bs)
            print(f"{name} {key}: {row[key]:.2f} ms", file=sys.stderr, flush=True)
            _save(out)
    kflags.set_impls(grouping="auto", fps="auto")

    # ---- (c) headline pin: 5 sustained repeats, median + spread ----
    for dtype in ("float32", "bfloat16"):
        key = f"headline_b8_{dtype}"
        if only and "headline" not in only and only not in key:
            if only:
                continue
        row = out.setdefault(key, {})
        if "repeats_ms" not in row or len(row["repeats_ms"]) < 5:
            reps = row.get("repeats_ms", [])
            while len(reps) < 5:
                reps.append(step_ms("pointnet2_cls_ssg", 8, dtype=dtype,
                                    min_seconds=3.0))
                row["repeats_ms"] = reps
                _save(out)
                print(f"{key} rep {len(reps)}: {reps[-1]:.3f} ms",
                      file=sys.stderr, flush=True)
            med = statistics.median(reps)
            row["median_ms"] = med
            row["spread_pct"] = 100.0 * (max(reps) - min(reps)) / med
            row["clouds_per_s"] = 8.0 / (med / 1e3)
            _save(out)

    _save(out)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
