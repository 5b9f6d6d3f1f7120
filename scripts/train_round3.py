"""Round-3 result production: complete the accuracy matrix (VERDICT r2 #1).

Round 2 left the entire MSG family and the generic pose head with zero
trained-accuracy evidence, and several SSG runs undertrained (best epoch ==
last epoch). The round-2 checkpoints did not survive the workspace reset, so
everything here trains from scratch — in PASSES: pass 1 gives every missing
model a first tranche of epochs (full matrix coverage as early as possible),
later passes extend toward the reference's 100-epoch recipe
(train_classification.py:88-95). Resume-safe: each pass resumes the same
experiment from its `latest` checkpoint; a SIGTERM checkpoints and exits
(train.loop.PreemptionGuard), so the suite can be stopped at any time and
every completed tranche is already recorded.

Deadline: set PLPE_TRAIN_DEADLINE to a unix timestamp — jobs are skipped
once past it (the in-flight job finishes its tranche via SIGTERM from the
caller or runs to tranche end).

Results: log/round3_results.json, merged into BASELINE.md by
scripts/summarize_results.py (auto-run at the end).
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
RESULTS = "log/round3_results.json"
DEADLINE = float(os.environ.get("PLPE_TRAIN_DEADLINE", "0")) or None

train_ds = load_dataset(DATA, "train")
test_ds = load_dataset(DATA, "test")
print(f"train={len(train_ds)} test={len(test_ds)}", flush=True)

# (model, [epoch targets per pass], extra cfg) — reference recipe settings
# (batch 24, Adam, lr 1e-3 cls / 1e-4 pose, wd 1e-4, StepLR(20, 0.7)) come
# from TrainConfig.for_model. Pass-1 targets mirror the round-2 budgets so
# the matrix fills fast; later passes converge on the 100-epoch recipe.
JOBS = [
    ("pointnet2_cls_msg", [15, 40, 100], {"epoch_chunk": 125}),
    ("rotation_msg", [12, 40, 100], {"epoch_chunk": 125}),
    ("translation_msg", [12, 40, 100], {"epoch_chunk": 125}),
    ("sign_msg", [10, 25, 60], {"epoch_chunk": 125}),
    ("pose", [100, 100, 100], {}),
    ("pointnet2_cls_ssg", [40, 70, 100], {}),
    ("rotation_ssg", [25, 60, 100], {}),
    ("translation_ssg", [25, 60, 100], {}),
    ("sign_ssg", [15, 40, 60], {}),
]

results = {}
if os.path.exists(RESULTS):
    results = json.load(open(RESULTS))


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
    for model, targets, extra in JOBS:
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
            model, experiment=f"r3_{model}", epochs=epochs, batch_size=24,
            ckpt_every=5, **extra,
        )
        try:
            _, history = train(cfg, train_ds, test_ds, resume=True)
            prev_wall = results.get(model, {}).get("wall_s", 0.0)
            results[model] = {
                "epochs_done": (history[-1]["epoch"] + 1) if history else epochs,
                "last": history[-1] if history else None,
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
