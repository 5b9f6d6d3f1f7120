"""Round-2 result production on the real chip: the full reference-recipe
training suite over the reference-scale dataset (7 classes x 8000 clouds,
6001/1999 split — ModelDataLoader.py:56-58), producing the BASELINE.md
north-star table: instance/class accuracy for the 3 classifiers, deg/axis
rotation error, cm translation error, sign accuracy, width error
(test_rotation.py:84-97 / test_translation.py:101 conventions).

Resume-safe: every job checkpoints 'latest' (ckpt_every) and re-running this
script skips completed epochs. Results append to log/round2_results.json
after every job. Epoch budgets are set from measured per-epoch wall times on
the v5e chip (pointnet_cls 4.2 s, pn2_ssg 35 s — see docs/SCALING.md);
the reference recipe is 100 epochs but the synthetic task converges earlier
for the heavy PointNet++ backbones, whose budgets are trimmed accordingly.
"""
import json
import os
import sys
import time

os.chdir("/root/repo")
sys.path.insert(0, "/root/repo")
from pointnet_like_pose_estimation_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()
import jax  # noqa: E402

from pointnet_like_pose_estimation_tpu.data import load_dataset  # noqa: E402
from pointnet_like_pose_estimation_tpu.models import get_model_spec  # noqa: E402
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
RESULTS = "log/round2_results.json"

train_ds = load_dataset(DATA, "train")
test_ds = load_dataset(DATA, "test")
print(f"train={len(train_ds)} test={len(test_ds)}", flush=True)

# (model, epochs, batch, extra cfg) — reference recipe: batch 24, Adam,
# lr 1e-3 cls / 1e-4 pose, wd 1e-4, StepLR(20, 0.7)
JOBS = [
    ("pointnet_cls", 100, 24, {}),
    ("rotation", 100, 24, {}),
    ("sign", 60, 24, {}),
    ("translation", 100, 24, {}),
    ("width", 60, 24, {}),
    ("pointnet2_cls_ssg", 40, 24, {}),
    ("rotation_ssg", 25, 24, {}),
    ("translation_ssg", 25, 24, {}),
    ("sign_ssg", 15, 24, {}),
    ("pointnet2_cls_msg", 15, 24, {"epoch_chunk": 125}),
    ("rotation_msg", 12, 24, {"epoch_chunk": 125}),
    ("translation_msg", 12, 24, {"epoch_chunk": 125}),
    ("sign_msg", 10, 24, {"epoch_chunk": 125}),
]

results = {}
if os.path.exists(RESULTS):
    results = json.load(open(RESULTS))


def best_eval(cfg: TrainConfig) -> dict | None:
    """Evaluate the best checkpoint (reference reports best-model metrics,
    train_classification.py:200-222)."""
    task = "classification" if "cls" in cfg.model else "pose"
    path = os.path.join(cfg.log_dir, task, cfg.experiment, "checkpoints", "best.msgpack")
    if not os.path.exists(path):
        return None
    _, _, fresh = build_state(cfg)
    state, meta = load_checkpoint(path, fresh)
    out = evaluate(cfg, state, test_ds)
    out["best_epoch"] = meta["epoch"]
    return out


for model, epochs, bs, extra in JOBS:
    done = results.get(model)
    if done and done.get("epochs_done", 0) >= epochs and "error" not in done:
        print(f"skip {model} (complete)", flush=True)
        continue
    t0 = time.time()
    cfg = TrainConfig.for_model(
        model, experiment=f"r2_{model}", epochs=epochs, batch_size=bs,
        ckpt_every=5, **extra,
    )
    try:
        _, history = train(cfg, train_ds, test_ds, resume=True)
        results[model] = {
            "epochs_done": (history[-1]["epoch"] + 1) if history else epochs,
            "last": history[-1] if history else None,
            "best_eval": best_eval(cfg),
            "wall_s": round(time.time() - t0, 1),
        }
        print(model, json.dumps(results[model]), flush=True)
    except Exception as e:  # noqa: BLE001 — record and continue the suite
        results[model] = {"error": f"{type(e).__name__}: {e}"}
        print(model, "FAILED:", e, flush=True)
    os.makedirs("log", exist_ok=True)
    with open(RESULTS, "w") as f:
        json.dump(results, f, indent=2)
print("ALL DONE", flush=True)
