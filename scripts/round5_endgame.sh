#!/bin/bash
# Round-5 end-of-round artifact refresh. Run AFTER the training queue exits
# (the chip must be free). Each step is resumable/idempotent.
set -x
cd /root/repo

# 1. e2e scene->grasp latency on the idle chip+host: measures the round-5
#    serving work (threaded cached-list DBSCAN, fused clean_scene dispatch,
#    fused post-DBSCAN scene program, bucketed shape reuse, pipelined
#    stream()). The round-4 artifact is preserved for the before/after.
[ -f log/e2e_latency_r4.json ] || git show 805e337:log/e2e_latency.json \
    > log/e2e_latency_r4.json 2>/dev/null || cp log/e2e_latency.json log/e2e_latency_r4.json
rm -f log/e2e_latency.json
timeout 2400 python scripts/bench_e2e_latency.py > /tmp/e2e_r5.out 2>&1

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
PLPE_AB_ONLY=headline_b8_bfloat16 timeout 1800 python scripts/ab_round5.py > /tmp/ab_r5b.out 2>&1

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

echo ENDGAME-DONE
