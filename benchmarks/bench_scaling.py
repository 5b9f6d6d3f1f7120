"""Data-parallel scaling methodology (VERDICT r1 item 8 / BASELINE.md
north-star: >=90% linear clouds/s efficiency).

Real multi-chip hardware is not available in this environment, so this
records the measurable proxy now and fixes the methodology for when it is.
On the virtual d-device CPU mesh every "device" shares the same physical
cores, so wall-clock weak scaling is meaningless (d x the work on the same
cores is ~d x the time by construction). The honest structural proxy is the
SHARDING OVERHEAD FACTOR:

    overhead(d) = t_mesh(d devices, global batch G) / t_single(1 device, G)

— same total FLOPs on the same cores; anything above 1.0 is the cost the
mesh program adds (collectives, partitioning, layout changes). A clean DP
program stays near 1.0, which on a real slice (where each device has its own
chip) translates to near-linear clouds/s. The BASELINE.md table is produced
by re-running this script on a real slice, where t_single stays at batch G/d
per chip and the efficiency column = t_single / t_mesh directly.

Writes log/bench_scaling.json.

Run: python benchmarks/bench_scaling.py  (CPU-safe; forces the virtual mesh)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from pointnet_like_pose_estimation_tpu.models import get_model_spec
from pointnet_like_pose_estimation_tpu.parallel import (
    make_mesh,
    make_parallel_train_step,
    replicate,
    shard_batch,
)
from pointnet_like_pose_estimation_tpu.train import TrainConfig
from pointnet_like_pose_estimation_tpu.train.loop import build_state


def _batch(rng, bs, num_points):
    return {
        "points": jnp.asarray(rng.standard_normal((bs, num_points, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 7, bs), jnp.int32),
        "rot": jnp.zeros((bs, 3), jnp.float32),
        "tran": jnp.zeros((bs, 3), jnp.float32),
        "sign": jnp.ones((bs,), jnp.float32),
        "width": jnp.zeros((bs, 1), jnp.float32),
    }


def step_time(d: int, global_bs: int, num_points: int,
              model="pointnet2_cls_ssg", iters=3):
    """Mean train-step seconds for global batch ``global_bs`` on a d-device
    'data' mesh (d=1 is the single-device baseline program)."""
    rng = np.random.default_rng(0)
    cfg = TrainConfig.for_model(model, num_points=num_points, batch_size=global_bs)
    spec, _, state = build_state(cfg)
    mesh = make_mesh({"data": d}, devices=jax.devices()[:d])
    state = replicate(state, mesh)
    step = make_parallel_train_step(get_model_spec(cfg.model), cfg, mesh)
    batch = shard_batch(_batch(rng, global_bs, num_points), mesh)
    state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters


def collective_bytes(d: int, global_bs: int, num_points: int,
                     model="pointnet2_cls_ssg"):
    """Per-step collective traffic of the compiled DP train step — the
    hardware-transferable number (utils/hlo.py): the SAME program XLA runs
    on a real slice, so its all-reduce sizes transfer verbatim."""
    from pointnet_like_pose_estimation_tpu.utils.hlo import (
        compiled_collective_traffic,
    )

    rng = np.random.default_rng(0)
    cfg = TrainConfig.for_model(model, num_points=num_points, batch_size=global_bs)
    spec, _, state = build_state(cfg)
    mesh = make_mesh({"data": d}, devices=jax.devices()[:d])
    state = replicate(state, mesh)
    step = make_parallel_train_step(get_model_spec(cfg.model), cfg, mesh)
    batch = shard_batch(_batch(rng, global_bs, num_points), mesh)
    compiled = jax.jit(step).lower(state, batch).compile()
    traffic = compiled_collective_traffic(compiled)
    ca = compiled.cost_analysis() or {}
    traffic["step_flops"] = float(ca.get("flops", 0.0))
    traffic["step_bytes_accessed"] = float(ca.get("bytes accessed", 0.0))
    return traffic


# v5e per-chip ICI: 4 links x ~50 GB/s/dir usable -> ~200 GB/s aggregate;
# conservative single-direction ring figure for the prediction
V5E_ICI_BYTES_PER_S = 45e9
V5E_HBM_BYTES_PER_S = 819e9
V5E_F32_FLOPS = 99e12


def _ring_wire_bytes(by_op: dict, d: int) -> float:
    """Ring-algorithm wire bytes per participant from HLO result bytes:
    all-reduce moves 2(d-1)/d x result, all-gather / reduce-scatter
    (d-1)/d, collective-permute / all-to-all ~1x."""
    factors = {
        "all-reduce": 2 * (d - 1) / d,
        "all-gather": (d - 1) / d,
        # hlo.py records reduce-scatter RESULT (per-shard) bytes in both
        # sync and async forms; a ring moves (d-1) shards per participant
        "reduce-scatter": d - 1.0,
        "collective-permute": 1.0,
        "all-to-all": 1.0,
    }
    return sum(rec["bytes"] * factors.get(op, 1.0) for op, rec in by_op.items())


def points_axis_traffic(d: int, B: int = 2, N: int = 4096):
    """Per-forward collective traffic of the POINT-SHARDED pn2_ssg forward
    at N=4096 (VERDICT r3 weak #7: the 'points' axis had correctness
    evidence only).

    Two accountings, both reported:
      - static HLO bytes from the compiled program (collectives inside the
        FPS ``while`` body count ONCE — an undercount);
      - the loop-aware analytic model from sharded_ops.py's design: per FPS
        iteration ONE packed [d,B,2+C] (max, argmax, coords) all-gather
        (round 5 fused the former per-iteration centroid psum into the
        candidate exchange; one [B,C] psum remains for the start index),
        then per SA layer one [B,S,C] centroid psum, one [d,B,S,K]
        candidate all-gather, one [B,S,K,C+D] neighborhood psum.
        Payloads are O(S*K), independent of N — the point of the design.
    """
    from pointnet_like_pose_estimation_tpu.parallel import (
        make_mesh,
        point_sharding,
    )
    from pointnet_like_pose_estimation_tpu.utils.hlo import (
        compiled_collective_traffic,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh({"points": d}, devices=jax.devices()[:d])
    cfg = TrainConfig.for_model("pointnet2_cls_ssg", num_points=N, batch_size=B)
    _, model, state = build_state(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x = jnp.ones((B, N, 3), jnp.float32)
    with point_sharding(mesh) as ctx:
        fwd = jax.jit(
            lambda p: model.apply(variables, p, train=False)[0],
            in_shardings=NamedSharding(mesh, P(None, "points")),
            out_shardings=NamedSharding(mesh, P()),
        )
        compiled = fwd.lower(x).compile()
    assert ctx.dispatch_count > 0, "forward did not route through sharded_ops"
    static = compiled_collective_traffic(compiled)

    # pn2_ssg dispatched SA layers: (S, K, C_geom, D_feat)
    layers = [(512, 32, 3, 0), (128, 64, 3, 128)]
    psum_b = gather_b = 0
    fps_collectives = sa_collectives = 0
    for S, K, C, Df in layers:
        psum_b += B * C * 4                    # FPS start-centroid psum (once)
        gather_b += S * (2 + C) * d * B * 4    # packed per-iter all-gather
        fps_collectives += S + 1
        psum_b += B * S * C * 4                # centroid gather psum
        gather_b += d * B * S * K * 4          # candidate-index all-gather
        psum_b += B * S * K * (C + Df) * 4     # neighborhood psum
        sa_collectives += 3
    wire = psum_b * 2 * (d - 1) / d + gather_b * (d - 1) / d
    t_coll = wire / V5E_ICI_BYTES_PER_S
    ca = compiled.cost_analysis() or {}
    # per-chip compute estimate for the bytes-bound forward: HBM traffic / d
    t_compute = float(ca.get("bytes accessed", 0.0)) / d / V5E_HBM_BYTES_PER_S
    return {
        "B": B, "N": N, "devices": d,
        "hlo_static_bytes": static["total_bytes"],
        "hlo_by_op": static["by_op"],
        "analytic_bytes_per_forward": psum_b + gather_b,
        "analytic_ring_wire_bytes": wire,
        "predicted_collective_s_at_ici": t_coll,
        # latency floor: S+1 packed exchanges per FPS call (round 5 halved
        # the naive 2S; the remaining S sequential hops are irreducible —
        # each iteration's argmax depends on the previous winner) + 3
        # collectives per SA layer, at ~1 us/hop ICI latency
        "collectives_per_forward": fps_collectives + sa_collectives,
        "latency_floor_s_at_1us_per_hop": (fps_collectives + sa_collectives) * 1e-6,
        "est_per_chip_compute_s_hbm_bound": t_compute,
        "predicted_real_slice_efficiency": (
            t_compute / (t_compute + t_coll) if t_compute else None
        ),
        "note": (
            "analytic model counts the FPS while-body collectives per "
            "iteration (static HLO counts them once); payloads are O(S*K), "
            "independent of N"
        ),
    }


def tp_axis_traffic(d: int, B: int = 24, N: int = 1024, model="rotation"):
    """Per-step collective traffic of the TENSOR-PARALLEL train step
    (Megatron specs over the wide MLP/FC stacks, parallel/tensor_parallel.py).
    All TP collectives live in the main computation (no loops), so the
    static HLO bytes ARE the per-step bytes."""
    from pointnet_like_pose_estimation_tpu.parallel import (
        make_mesh,
        make_parallel_train_step,
        shard_batch,
        shard_state_tp,
    )
    from pointnet_like_pose_estimation_tpu.utils.hlo import (
        compiled_collective_traffic,
    )

    rng = np.random.default_rng(0)
    mesh = make_mesh({"data": 1, "model": d}, devices=jax.devices()[:d])
    cfg = TrainConfig.for_model(model, num_points=N, batch_size=B, augment=False)
    spec, _, state = build_state(cfg)
    state = shard_state_tp(state, mesh)
    step = make_parallel_train_step(
        get_model_spec(cfg.model), cfg, mesh, tp_axis="model", state=state
    )
    batch = shard_batch(_batch(rng, B, N), mesh)
    compiled = jax.jit(step).lower(state, batch).compile()
    traffic = compiled_collective_traffic(compiled)
    ca = compiled.cost_analysis() or {}
    wire = _ring_wire_bytes(traffic["by_op"], d)
    t_coll = wire / V5E_ICI_BYTES_PER_S
    # per-chip compute: the step is HBM-bound (docs/PERF.md); bytes/d / bw
    t_compute = float(ca.get("bytes accessed", 0.0)) / d / V5E_HBM_BYTES_PER_S
    return {
        "model": model, "B": B, "N": N, "devices": d,
        "collective_result_bytes": traffic["total_bytes"],
        "collective_by_op": traffic["by_op"],
        "ring_wire_bytes": wire,
        "predicted_collective_s_at_ici": t_coll,
        "est_per_chip_compute_s_hbm_bound": t_compute,
        "predicted_real_slice_efficiency": (
            t_compute / (t_compute + t_coll) if t_compute else None
        ),
    }


def main():
    per_device_bs = int(os.environ.get("PLPE_SCALING_BS", 8))
    # CPU default trimmed to keep the structural check fast; on a real slice
    # set PLPE_SCALING_N=1024 PLPE_SCALING_BS=32 for the BASELINE.md table
    num_points = int(os.environ.get("PLPE_SCALING_N", 256))
    platform = jax.devices()[0].platform
    n = len(jax.devices())
    sizes = [d for d in (2, 4, 8) if d <= n]
    print(f"platform={platform} devices={n} per_device_batch={per_device_bs} "
          f"num_points={num_points}", file=sys.stderr)
    # PLPE_SCALING_TRAFFIC_ONLY=1: compute only the HLO-derived sections
    # (points/TP axes) and merge them into the existing artifact — the
    # wall-clock overhead rows are timing-sensitive and stay untouched
    traffic_only = bool(os.environ.get("PLPE_SCALING_TRAFFIC_ONLY"))
    rows = {}
    for d in [] if traffic_only else sizes:
        g = d * per_device_bs
        t_single = step_time(1, g, num_points)
        t_mesh = step_time(d, g, num_points)
        overhead = t_mesh / t_single
        traffic = collective_bytes(d, g, num_points)
        # real-slice prediction: ring all-reduce wire bytes = 2(d-1)/d x
        # result bytes; overlap ignored (pessimistic). Compute time comes
        # from the committed single-chip step time at this per-device batch
        # when available (log/throughput_diagnosis.json).
        wire = traffic["total_bytes"] * 2 * (d - 1) / d
        t_coll = wire / V5E_ICI_BYTES_PER_S
        t_chip = None
        try:  # prefer the sustained-protocol bench artifact (round 4)
            with open("benchmarks_extended.json") as f:
                ext = json.load(f)
            t_chip = ext.get(f"pn2_ssg_train_b{per_device_bs}_step_s")
        except (OSError, ValueError):  # missing OR truncated mid-write
            pass
        if t_chip is None:
            try:
                with open("log/throughput_diagnosis.json") as f:
                    diag = json.load(f)
                key = f"b{per_device_bs}"
                if key in diag:
                    t_chip = diag[key]["train_step_ms"] / 1e3
            except (OSError, ValueError):
                pass
        rows[d] = {
            "global_batch": g,
            "t_single_device_s": t_single,
            "t_mesh_s": t_mesh,
            "sharding_overhead_factor": overhead,
            "collective_result_bytes": traffic["total_bytes"],
            "collective_by_op": traffic["by_op"],
            "ring_wire_bytes": wire,
            "predicted_collective_s_at_ici": t_coll,
            "predicted_real_slice_efficiency": (
                t_chip / (t_chip + t_coll) if t_chip else None
            ),
        }
        print(f"d={d} G={g}: single {t_single*1e3:8.1f} ms, mesh "
              f"{t_mesh*1e3:8.1f} ms -> overhead x{overhead:.2f}; "
              f"collectives {traffic['total_bytes']/1e6:.2f} MB/step",
              file=sys.stderr)
    # overhead-vs-batch probe: if the d=8 overhead is fixed host cost, it
    # shrinks as per-device batch grows (the 2-core host runs 8 device
    # threads; compute scales, per-step sync does not)
    probe = {}
    if 8 <= n and not traffic_only:
        for bs in (per_device_bs, per_device_bs * 4):
            t_single = step_time(1, 8 * bs, num_points)
            t_mesh = step_time(8, 8 * bs, num_points)
            probe[bs] = t_mesh / t_single
            print(f"overhead(d=8, per-device bs={bs}): x{probe[bs]:.2f}",
                  file=sys.stderr)
    # the other two parallelism axes (VERDICT r3 weak #7): HLO-derived
    # per-step collective traffic + predicted ICI time for a point-sharded
    # N=4096 forward and a TP train step
    # start from the existing artifact so extra rows (e.g. the committed
    # N=65536 measurements) survive re-runs in either mode
    points_rows, tp_rows = {}, {}
    try:
        with open("log/bench_scaling.json") as f:
            _prev_art = json.load(f)
        points_rows = dict(_prev_art.get("points_axis", {}))
        tp_rows = dict(_prev_art.get("model_axis_tp", {}))
    except (OSError, ValueError):
        pass

    def _eff(row):
        e = row.get("predicted_real_slice_efficiency")
        return "n/a" if e is None else f"{e:.3f}"

    for d in sizes:
        points_rows[str(d)] = points_axis_traffic(d)
        print(
            f"points axis d={d}: analytic "
            f"{points_rows[str(d)]['analytic_bytes_per_forward']/1e6:.2f} MB/fwd, "
            f"pred efficiency {_eff(points_rows[str(d)])}",
            file=sys.stderr,
        )
        tp_rows[str(d)] = tp_axis_traffic(d)
        print(
            f"model (TP) axis d={d}: "
            f"{tp_rows[str(d)]['collective_result_bytes']/1e6:.2f} MB/step, "
            f"pred efficiency {_eff(tp_rows[str(d)])}",
            file=sys.stderr,
        )

    out = {
        "platform": platform,
        "mode": "sharding-overhead (same global batch, mesh vs single device)",
        "model": "pointnet2_cls_ssg",
        "per_device_batch": per_device_bs,
        "num_points": num_points,
        "results": rows,
        "points_axis": points_rows,
        "model_axis_tp": tp_rows,
        "overhead_vs_per_device_batch_d8": probe,
        "note": (
            "virtual CPU mesh shares physical cores: overhead ~1.0 means the "
            "DP program adds no serialized work; real-slice efficiency = "
            "1/overhead measured there (BASELINE.md >=90% target). "
            "collective_result_bytes comes from the compiled HLO (the same "
            "program a real slice runs); predicted_real_slice_efficiency = "
            "t_chip / (t_chip + ring_wire_bytes / ICI_bw) with zero overlap "
            "assumed."
        ),
    }
    os.makedirs("log", exist_ok=True)
    if traffic_only and os.path.exists("log/bench_scaling.json"):
        with open("log/bench_scaling.json") as f:
            prev = json.load(f)
        prev["points_axis"] = points_rows
        prev["model_axis_tp"] = tp_rows
        out = prev
    with open("log/bench_scaling.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(
        {d: round(v["sharding_overhead_factor"], 3) for d, v in rows.items()}
    ))


if __name__ == "__main__":
    main()
