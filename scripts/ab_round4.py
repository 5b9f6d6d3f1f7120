"""Round-4 perf A/B on the real chip: (a) gather backward scatter vs one-hot
matmul VJP, (b) shape-aware auto kernel dispatch vs forced Pallas/XLA — both
measured on the FULL jitted train step with SUSTAINED timing.

Measurement protocol matters here (utils/profiling.sustained_time): over the
axon tunnel ``block_until_ready`` can return early for short dispatch queues
of small programs — a 20-iteration loop of the 17 ms B=24 step reported
1.2 ms. Every timing below runs until the span covers >= 2 s of wall clock
and fetches the loss to the host, which converges to the true sustained rate.

Writes log/ab_round4.json (merge-update).
"""
import json
import os
import sys
import time

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


def _batch(rng, bs, n=1024):
    return {
        "points": jnp.asarray(rng.standard_normal((bs, n, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 7, bs), jnp.int32),
        "rot": jnp.zeros((bs, 3), jnp.float32),
        "tran": jnp.zeros((bs, 3), jnp.float32),
        "sign": jnp.ones((bs,), jnp.float32),
        "width": jnp.zeros((bs, 1), jnp.float32),
    }


def sustained_step_time(model, bs, *, min_seconds=2.0, dtype="float32"):
    """Seconds/step of the donated train step under sustained load."""
    rng = np.random.default_rng(0)
    cfg = TrainConfig.for_model(model, num_points=1024, batch_size=bs, dtype=dtype)
    spec, _, state = build_state(cfg)
    step = make_train_step(spec, cfg)
    batch = _batch(rng, bs)
    from pointnet_like_pose_estimation_tpu.utils import (
        sustained_step_time as _sst,
    )

    t, _ = _sst(step, state, batch, min_seconds=min_seconds)
    return t


def main():
    out = {}
    if os.path.exists("log/ab_round4.json"):
        out = json.load(open("log/ab_round4.json"))
    cases = [
        ("pointnet2_cls_ssg", 24),
        ("pointnet2_cls_ssg", 8),
        ("pointnet2_cls_ssg", 256),
        ("rotation_msg", 24),
    ]
    only = os.environ.get("PLPE_AB_ONLY")
    for model, bs in cases:
        if only and only not in f"{model}_b{bs}":
            continue
        row = out.setdefault(f"{model}_b{bs}", {})
        # gather-VJP A/B under forced-Pallas dispatch (the config every
        # committed r3 number used)
        kflags.set_impls(grouping="pallas", fps="pallas")
        for vjp in ("scatter", "auto"):
            geometry._GATHER_VJP = vjp
            key = f"pallas_{vjp}_ms"
            if key not in row:
                row[key] = sustained_step_time(model, bs) * 1e3
                print(f"{model} B={bs} pallas/{vjp}: {row[key]:.2f} ms",
                      file=sys.stderr, flush=True)
                json.dump(out, open("log/ab_round4.json", "w"), indent=2)
        # dispatch A/B at the winning VJP: shape-aware auto vs forced pallas
        best_vjp = ("auto" if row["pallas_auto_ms"] <= row["pallas_scatter_ms"]
                    else "scatter")
        geometry._GATHER_VJP = best_vjp
        kflags.set_impls(grouping="auto", fps="auto")
        key = f"autodispatch_{best_vjp}_ms"
        if key not in row:
            row[key] = sustained_step_time(model, bs) * 1e3
            print(f"{model} B={bs} auto-dispatch/{best_vjp}: {row[key]:.2f} ms",
                  file=sys.stderr, flush=True)
            json.dump(out, open("log/ab_round4.json", "w"), indent=2)
        # forced-XLA grouping reference at the same VJP (is the rule right?)
        kflags.set_impls(grouping="xla", fps="pallas")
        key = f"xla_grouping_{best_vjp}_ms"
        if key not in row:
            row[key] = sustained_step_time(model, bs) * 1e3
            print(f"{model} B={bs} xla-grouping/{best_vjp}: {row[key]:.2f} ms",
                  file=sys.stderr, flush=True)
            json.dump(out, open("log/ab_round4.json", "w"), indent=2)
        kflags.set_impls(grouping="auto", fps="auto")
    json.dump(out, open("log/ab_round4.json", "w"), indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
