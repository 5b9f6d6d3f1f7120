"""Round-5 result production: FREEZE the accuracy matrix (VERDICT r4 #1)
and validate bf16 end-to-end (VERDICT r4 #2).

Round 4 left four rows labeled "climbing" (docs/CONVERGENCE.md):
pointnet2_cls_msg (20 ep), sign_msg (30 ep), translation_ssg (75 ep), and
rotation_msg — whose finished 60-epoch extension is now folded (3.93 deg
@58, plateauing). Every job below RESUMES its surviving experiment and
extends toward the reference's 100-epoch recipe
(train_classification.py:88-95). The two r5_* bf16 jobs are FRESH runs of
the identical recipe at dtype=bfloat16 — the accuracy evidence the 2,294
clouds/s bf16 perf headline needs (the reference trains f32 throughout,
train_classification.py:115-124).

Ordering: cheapest climbing row first so a deadline cut still clears the
most labels; bf16 validation lands in pass 1 ahead of the deep MSG
extensions because VERDICT ranks it #2.

Deadline: PLPE_TRAIN_DEADLINE (unix ts) — jobs are skipped once past it.
Results: log/round5_results.json (seeded from round 4; bf16 rows keyed
<model>_bf16), merged into BASELINE.md by scripts/summarize_results.py.
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
RESULTS = "log/round5_results.json"
DEADLINE = float(os.environ.get("PLPE_TRAIN_DEADLINE", "0")) or None

train_ds = load_dataset(DATA, "train")
test_ds = load_dataset(DATA, "test")
print(f"train={len(train_ds)} test={len(test_ds)}", flush=True)

# (result key, model, experiment, [epoch targets per pass], extra cfg).
#
# Restart order (round-5 mid-course correction): the first bf16 attempt
# trained with bfloat16 BatchNorm and collapsed (41% vs 99% — bisected to
# the normalization arithmetic, see nn/layers.batch_norm_f32). With the
# fix landed the bf16 validation runs FIRST (fresh experiments, broken
# state deleted), then the remaining convergence extensions.
JOBS = [
    # bf16 validation (fresh; reference recipe, dtype flipped, f32 BN)
    ("pointnet2_cls_ssg_bf16", "pointnet2_cls_ssg", "r5_pn2_ssg_bf16",
     [40, 40, 40], {"dtype": "bfloat16"}),
    ("translation_msg_bf16", "translation_msg", "r5_translation_msg_bf16",
     [25, 32, 40], {"dtype": "bfloat16", "epoch_chunk": 125}),
    # Post-reset queue: the round-5 container was recycled mid-round, wiping
    # data_cache/ and every UNCOMMITTED experiment dir (the r3_{rotation_msg,
    # sign_msg,pointnet2_cls_msg,translation_ssg} checkpoints the original
    # queue resumed). Within the remaining chip budget only the cheapest
    # climbing row (translation_ssg, SSG-speed) is retrainable from scratch;
    # the MSG extensions (~2.4 min/epoch each) are not, and their committed
    # round-4 numbers stand as honest floors (docs/CONVERGENCE.md).
    ("translation_ssg", "translation_ssg", "r5_translation_ssg",
     [60, 80, 100], {}),
    ("sign_msg", "sign_msg", "r5_sign_msg",
     [35, 50, 60], {"epoch_chunk": 125}),
]

results = {}
if os.path.exists(RESULTS):
    results = json.load(open(RESULTS))
elif os.path.exists("log/round4_results.json"):
    r4 = json.load(open("log/round4_results.json"))
    results = {k: dict(v) for k, v in r4.items() if "error" not in v}


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


for p in range(3):
    for key, model, experiment, targets, extra in JOBS:
        epochs = targets[p]
        done = results.get(key, {})
        if done.get("epochs_done", 0) >= epochs and "error" not in done:
            continue
        if DEADLINE and time.time() > DEADLINE:
            print(f"deadline passed; stopping before {key} pass {p}", flush=True)
            save()
            sys.exit(0)
        t0 = time.time()
        cfg = TrainConfig.for_model(
            model, experiment=experiment, epochs=epochs, batch_size=24,
            ckpt_every=5, **extra,
        )
        try:
            _, history = train(cfg, train_ds, test_ds, resume=True)
            prev_wall = results.get(key, {}).get("wall_s", 0.0)
            results[key] = {
                "model": model,
                "dtype": cfg.dtype,
                "epochs_done": (history[-1]["epoch"] + 1) if history else epochs,
                "last": history[-1] if history else results.get(key, {}).get("last"),
                "best_eval": best_eval(cfg),
                "wall_s": round(prev_wall + time.time() - t0, 1),
            }
            print(f"pass {p} {key}: " + json.dumps(results[key].get("best_eval") or {}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue the suite
            results[key] = {"error": f"{type(e).__name__}: {e}",
                            "epochs_done": done.get("epochs_done", 0)}
            print(f"pass {p} {key} FAILED: {e}", flush=True)
        save()

save()
subprocess.run([sys.executable, "scripts/summarize_results.py"], check=False)
print("ALL DONE", flush=True)
