"""Round-3 vanilla pipeline checkpoints (short recipe, endgame window).

Trains/resumes the vanilla heads whose BEST checkpoints ship in git so the
trained e2e replay test (tests/test_e2e_replay.py) runs from a fresh
clone. The e2e assertions need correct classes + localization, not
converged pose accuracy, so rotation/sign use short budgets; translation
(r3_translation_ref, 60 epochs) already exists from the label experiment;
width resumes to its 60-epoch budget. Every job is resume-safe."""
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

JOBS = [
    ("rotation", "r3_rotation", 25, {}),
    ("sign", "r3_sign", 20, {}),
    ("width", "r3_width_ref", 60, {}),
    ("width", "r3_width_acl", 60, {"augment_consistent_labels": True}),
]

for model, exp, epochs, extra in JOBS:
    t0 = time.time()
    cfg = TrainConfig.for_model(
        model, experiment=exp, epochs=epochs, batch_size=24, ckpt_every=10,
        **extra,
    )
    _, history = train(cfg, train_ds, test_ds, resume=True)
    last = history[-1] if history else {}
    print(exp, json.dumps(last), f"wall={time.time()-t0:.0f}s", flush=True)
print("DONE", flush=True)
