"""Translation z-error experiment (VERDICT r2 #3 resolution).

log/anomaly_probe.json shows the z-error anomaly is TRAIN-TIME LABEL NOISE:
the reference recipe scales/shifts the cloud (and thus the captured
centroid) while leaving targets raw, a per-axis noise floor of
std(s)*E|t_axis| = 3.3/3.3/10.4 cm — z is 3x because |t_z|~0.8 m. This
trains the vanilla translation head twice at the reference recipe:

  A. reference-faithful augmentation (targets raw)        -> r3_translation_ref
  B. augment_consistent_labels=True (targets transformed) -> r3_translation_acl

and records both per-axis eval errors. Expected: B's z-error collapses to
the x/y level, confirming the diagnosis causally (not just correlationally).

Writes log/translation_label_experiment.json.
"""
import json
import os
import sys
import time

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
from pointnet_like_pose_estimation_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

from pointnet_like_pose_estimation_tpu.data import load_dataset  # noqa: E402
from pointnet_like_pose_estimation_tpu.train import (  # noqa: E402
    TrainConfig,
    evaluate,
    train,
)
from pointnet_like_pose_estimation_tpu.train.loop import (  # noqa: E402
    build_state,
    load_checkpoint,
)

DATA = os.environ.get("PLPE_DATASET", "data_cache/dataset_full.npz")
EPOCHS = int(os.environ.get("PLPE_EXP_EPOCHS", 60))
OUT = "log/translation_label_experiment.json"

train_ds = load_dataset(DATA, "train")
test_ds = load_dataset(DATA, "test")

results = {}
if os.path.exists(OUT):
    results = json.load(open(OUT))

JOBS = [
    ("ref", "translation", False),
    ("acl", "translation", True),
    ("width_ref", "width", False),
    ("width_acl", "width", True),
]

for tag, model, acl in JOBS:
    if tag in results:
        continue
    t0 = time.time()
    cfg = TrainConfig.for_model(
        model, experiment=f"r3_{tag}" if model != "translation" else f"r3_translation_{tag}",
        epochs=EPOCHS, batch_size=24, ckpt_every=10,
        augment_consistent_labels=acl,
    )
    _, history = train(cfg, train_ds, test_ds, resume=True)
    path = os.path.join(cfg.log_dir, "pose", cfg.experiment,
                        "checkpoints", "best.msgpack")
    _, _, fresh = build_state(cfg)
    state, meta = load_checkpoint(path, fresh)
    ev = evaluate(cfg, state, test_ds)
    results[tag] = {
        "model": model,
        "augment_consistent_labels": acl,
        "epochs": EPOCHS,
        "best_epoch": meta["epoch"],
        "mean_err": ev["mean_err"],
        "wall_s": round(time.time() - t0, 1),
    }
    if "axis_err" in ev:
        results[tag]["axis_err_cm"] = ev["axis_err"]
    print(tag, json.dumps(results[tag]), flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
print("DONE", flush=True)
