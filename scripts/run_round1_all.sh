#!/bin/bash
# Round-1 result production: dataset build + reference-recipe training runs.
set -e
cd /root/repo
mkdir -p log data_cache
if [ ! -f data_cache/dataset.npz ]; then
  python -m pointnet_like_pose_estimation_tpu.cli generate \
    --num-per-class 800 --out data_cache/dataset.npz
fi
python scripts/train_round1.py
python scripts/train_round1b.py
