#!/bin/bash
# Round-4 end-of-round artifact refresh. Run AFTER the training queue exits
# (the chip must be free). Each step is resumable/idempotent.
set -x
cd /root/repo

# 1. sustained-protocol throughput diagnosis (feeds PERF.md + DP predictions)
timeout 2400 python scripts/diagnose_throughput.py > /tmp/diag_r4.out 2>&1

# 2. kernel bench re-run incl. the auto-dispatch verification section
timeout 2400 python benchmarks/bench_kernels.py > /tmp/kern_r4.out 2>&1

# 3. convergence report + BASELINE tables from the final results
python scripts/convergence_report.py > /dev/null
python scripts/summarize_results.py

# 4. e2e grasp demo with the round-4 best checkpoints (CPU-safe); the
# pipeline classifier/heads point at the experiments the queue extended
JAX_PLATFORMS=cpu timeout 900 python examples/e2e_demo.py --checkpoints '{
  "classifier": "log/classification/r3_pointnet2_cls_ssg/checkpoints/best.msgpack",
  "rotation": "log/pose/r3_rotation/checkpoints/best.msgpack",
  "sign": "log/pose/r3_sign/checkpoints/best.msgpack",
  "translation": "log/pose/r3_translation_ref/checkpoints/best.msgpack",
  "width": "log/pose/r3_width_ref/checkpoints/best.msgpack"
}' > log/e2e_demo_trained.txt 2>&1 || true

echo ENDGAME-DONE
