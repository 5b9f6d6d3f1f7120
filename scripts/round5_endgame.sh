#!/bin/bash
# Round-5 end-of-round artifact refresh. Run AFTER the training queue exits
# (the chip must be free). Each step is resumable/idempotent.
set -x
cd /root/repo

# 1. e2e scene->grasp latency on the idle chip+host: measures the round-5
#    serving work (threaded cached-list DBSCAN, fused clean_scene dispatch,
#    fused post-DBSCAN scene program, bucketed shape reuse, pipelined
#    stream()). The pre-rework artifact is preserved for the before/after.
[ -f log/e2e_latency_prestream.json ] || git show 805e337:log/e2e_latency.json \
    > log/e2e_latency_prestream.json 2>/dev/null || cp log/e2e_latency.json log/e2e_latency_prestream.json
rm -f log/e2e_latency.json
PLPE_E2E_REPS=7 timeout 1500 python scripts/bench_e2e_latency.py > /tmp/e2e_r5.out 2>&1

# 1b. re-pin the bf16 headline with the f32-BatchNorm fix (the committed
#     2,300 clouds/s row was measured with bf16 BN, which the accuracy
#     bisection disqualified); the old row is preserved under *_bf16bn
python - <<'PYEOF'
import json
p = "log/ab_round5.json"
d = json.load(open(p))
if "headline_b8_bfloat16" in d and "headline_b8_bfloat16_bf16bn" not in d:
    d["headline_b8_bfloat16_bf16bn"] = d.pop("headline_b8_bfloat16")
    json.dump(d, open(p, "w"), indent=2)
    print("bf16 headline cleared for re-measurement")
PYEOF
PLPE_AB_ONLY=headline_b8_bfloat16 timeout 1500 python scripts/ab_round5.py > /tmp/ab_r5b.out 2>&1

# 1c. sync benchmarks_extended.json's pre-BN-fix bf16 keys to the re-pinned
#     measurement so every committed bf16 perf number reflects the shipped
#     (f32-BatchNorm) program
python - <<'PYEOF'
import json
ab = json.load(open("log/ab_round5.json"))
row = ab.get("headline_b8_bfloat16")
if row:
    p = "benchmarks_extended.json"
    d = json.load(open(p))
    old_t = d.get("pn2_ssg_train_b8_bf16_step_s")
    new_t = row["median_ms"] / 1e3
    if old_t and "pn2_ssg_train_b8_bf16_mfu_vs_bf16_peak" in d:
        # same program FLOPs -> MFU rescales by the step-time ratio
        d["pn2_ssg_train_b8_bf16_mfu_vs_bf16_peak"] *= old_t / new_t
    d["pn2_ssg_train_b8_bf16_step_s"] = new_t
    d["pn2_ssg_train_b8_bf16_clouds_per_s"] = row["clouds_per_s"]
    d["pn2_ssg_train_b8_bf16_note"] = (
        "re-measured under the f32-BatchNorm fix "
        "(log/ab_round5.json headline_b8_bfloat16, median of 5 sustained runs); "
        "MFU rescaled by the step-time ratio"
    )
    json.dump(d, open(p, "w"), indent=2)
    print("benchmarks_extended bf16 keys synced")
PYEOF

# 2. convergence report + BASELINE tables from the final queue results
python scripts/convergence_report.py > /dev/null
python scripts/summarize_results.py

# 3. e2e grasp demo refresh with the extended best checkpoints (CPU-safe)
JAX_PLATFORMS=cpu timeout 900 python examples/e2e_demo.py --checkpoints '{
  "classifier": "log/classification/r3_pointnet2_cls_ssg/checkpoints/best.msgpack",
  "rotation": "log/pose/r3_rotation/checkpoints/best.msgpack",
  "sign": "log/pose/r3_sign/checkpoints/best.msgpack",
  "translation": "log/pose/r3_translation_ref/checkpoints/best.msgpack",
  "width": "log/pose/r3_width_ref/checkpoints/best.msgpack"
}' > log/e2e_demo_trained.txt 2>&1 || true

# 4. driver-entry sanity on the CPU mesh (chip-free)
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 900 python __graft_entry__.py > /tmp/graft_check.out 2>&1 || true
tail -2 /tmp/graft_check.out

echo ENDGAME-DONE
