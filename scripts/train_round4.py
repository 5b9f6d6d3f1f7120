"""Round-4 result production: CONVERGE the accuracy matrix (VERDICT r3 #1)
and train the GenericPoseHead config lattice (VERDICT r3 #7).

Round 3 shipped floors for the PointNet++ families — best epoch == last
epoch for every MSG model and sign_ssg (log/round3_results.json). This
round's checkpoints SURVIVED (log/{classification,pose}/r3_*/checkpoints/
latest.msgpack), so every job RESUMES its r3 experiment and extends toward
the reference's 100-epoch recipe (train_classification.py:88-95). Cheap
jobs run first so every row moves off best@last before the expensive MSG
extensions; passes iterate so a deadline cut still leaves a balanced
matrix.

Deadline: PLPE_TRAIN_DEADLINE (unix ts) — jobs are skipped once past it.
Results: log/round4_results.json (seeded from round 3), merged into
BASELINE.md by scripts/summarize_results.py (auto-run at the end).
"""
import json
import os
import subprocess
import sys
import time

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
from pointnet_like_pose_estimation_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()
import jax  # noqa: E402

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
RESULTS = "log/round4_results.json"
DEADLINE = float(os.environ.get("PLPE_TRAIN_DEADLINE", "0")) or None

train_ds = load_dataset(DATA, "train")
test_ds = load_dataset(DATA, "test")
print(f"train={len(train_ds)} test={len(test_ds)}", flush=True)

# (model, experiment, [epoch targets per pass], extra cfg). r3_* experiment
# names resume the surviving round-3 checkpoints; r4_* are fresh (lattice).
# Targets follow the reference recipe caps used per family in rounds 2-3
# (100 for cls/rotation/translation, 60 for sign/width-class budgets).
# 4 passes; each tranche is sized so a deadline cut mid-tranche overruns by
# <= ~45 min of chip time (the deadline is only checked between jobs)
JOBS = [
    # cheap first: the pose.py lattice (vanilla speed, fresh)
    ("pose_classify", "r4_pose_classify", [10, 10, 10, 10], {}),
    ("pose_transform", "r4_pose_transform", [60, 100, 100, 100], {}),
    ("pose_feat_trans", "r4_pose_feat_trans", [60, 100, 100, 100], {}),
    ("pose_mean", "r4_pose_mean", [60, 100, 100, 100], {}),
    # quick SSG completions to clear best@last cheaply
    ("sign_ssg", "r3_sign_ssg", [60, 80, 100, 100], {}),
    ("translation_ssg", "r3_translation_ssg", [60, 75, 100, 100], {}),
    ("rotation_ssg", "r3_rotation_ssg", [60, 75, 100, 100], {}),
    ("pointnet2_cls_ssg", "r3_pointnet2_cls_ssg", [40, 70, 100, 100], {}),
    # MSG family ahead of the deep SSG extensions: rotation_msg is the model
    # that must challenge the vanilla head (VERDICT r3 #1), so its epochs
    # outrank SSG 60->100 polish under a deadline. pn2_cls_msg is already at
    # 99.56% — deferred to the last pass.
    ("rotation_msg", "r3_rotation_msg", [45, 60, 80, 100], {"epoch_chunk": 125}),
    ("translation_msg", "r3_translation_msg", [40, 60, 80, 100], {"epoch_chunk": 125}),
    ("sign_msg", "r3_sign_msg", [30, 45, 60, 80], {"epoch_chunk": 125}),
    ("pointnet2_cls_msg", "r3_pointnet2_cls_msg", [20, 25, 40, 40], {"epoch_chunk": 125}),
]

results = {}
if os.path.exists(RESULTS):
    results = json.load(open(RESULTS))
elif os.path.exists("log/round3_results.json"):
    # seed epochs_done/skip state from round 3 (same experiments resumed)
    r3 = json.load(open("log/round3_results.json"))
    results = {k: dict(v) for k, v in r3.items() if "error" not in v}


def best_eval(cfg: TrainConfig) -> dict | None:
    task = "classification" if "cls" in cfg.model else "pose"
    path = os.path.join(cfg.log_dir, task, cfg.experiment, "checkpoints", "best.msgpack")
    if not os.path.exists(path):
        return None
    _, _, fresh = build_state(cfg)
    state, meta = load_checkpoint(path, fresh)
    out = evaluate(cfg, state, test_ds)
    out["best_epoch"] = meta["epoch"]
    return out


def save():
    os.makedirs("log", exist_ok=True)
    with open(RESULTS, "w") as f:
        json.dump(results, f, indent=2)


for p in range(4):
    for model, experiment, targets, extra in JOBS:
        epochs = targets[p]
        done = results.get(model, {})
        if done.get("epochs_done", 0) >= epochs and "error" not in done:
            continue
        if DEADLINE and time.time() > DEADLINE:
            print(f"deadline passed; stopping before {model} pass {p}", flush=True)
            save()
            sys.exit(0)
        t0 = time.time()
        cfg = TrainConfig.for_model(
            model, experiment=experiment, epochs=epochs, batch_size=24,
            ckpt_every=5, **extra,
        )
        try:
            _, history = train(cfg, train_ds, test_ds, resume=True)
            prev_wall = results.get(model, {}).get("wall_s", 0.0)
            results[model] = {
                "epochs_done": (history[-1]["epoch"] + 1) if history else epochs,
                "last": history[-1] if history else results.get(model, {}).get("last"),
                "best_eval": best_eval(cfg),
                "wall_s": round(prev_wall + time.time() - t0, 1),
            }
            print(f"pass {p} {model}: " + json.dumps(results[model].get("best_eval") or {}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue the suite
            results[model] = {"error": f"{type(e).__name__}: {e}",
                              "epochs_done": done.get("epochs_done", 0)}
            print(f"pass {p} {model} FAILED: {e}", flush=True)
        save()

save()
subprocess.run([sys.executable, "scripts/summarize_results.py"], check=False)
print("ALL DONE", flush=True)
