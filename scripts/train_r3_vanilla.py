"""Round-3 vanilla rotation + sign heads (reference recipe) — the two
pipeline checkpoints not covered by train_round3.py (MSG/SSG families) or
exp_translation_labels.py (translation/width). Together they complete the
5-model set the committed-checkpoint policy ships for the e2e replay test
(tests/test_e2e_replay.py)."""
import json
import os
import sys
import time

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
from pointnet_like_pose_estimation_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

from pointnet_like_pose_estimation_tpu.data import load_dataset  # noqa: E402
from pointnet_like_pose_estimation_tpu.train import TrainConfig, train  # noqa: E402

DATA = os.environ.get("PLPE_DATASET", "data_cache/dataset_full.npz")
train_ds = load_dataset(DATA, "train")
test_ds = load_dataset(DATA, "test")

for model, epochs in (("rotation", 100), ("sign", 60)):
    t0 = time.time()
    cfg = TrainConfig.for_model(
        model, experiment=f"r3_{model}", epochs=epochs, batch_size=24,
        ckpt_every=10,
    )
    _, history = train(cfg, train_ds, test_ds, resume=True)
    last = history[-1] if history else {}
    print(model, json.dumps(last), f"wall={time.time()-t0:.0f}s", flush=True)
print("DONE", flush=True)
