"""Round-1b training on the real chip: PointNet++ (SSG/MSG) classifiers and
SSG/MSG pose heads on the 800/class set, completing log/round1_results.json."""
import json, os, sys, time
os.chdir('/root/repo'); sys.path.insert(0, '/root/repo')
from pointnet_like_pose_estimation_tpu.utils import enable_compile_cache
enable_compile_cache()
from pointnet_like_pose_estimation_tpu.data import load_dataset
from pointnet_like_pose_estimation_tpu.train import TrainConfig, train

train_ds = load_dataset("data_cache/dataset.npz", "train")
test_ds = load_dataset("data_cache/dataset.npz", "test")
print(f"train={len(train_ds)} test={len(test_ds)}", flush=True)

results = {}
if os.path.exists("log/round1_results.json"):
    results = json.load(open("log/round1_results.json"))

jobs = [
    ("pointnet2_cls_ssg", dict(epochs=20, batch_size=64)),
    ("pointnet2_cls_msg", dict(epochs=8, batch_size=32)),
    ("rotation_msg", dict(epochs=12, batch_size=24)),
    ("sign_ssg", dict(epochs=10, batch_size=24)),
    ("translation_ssg", dict(epochs=10, batch_size=24)),
]
for model, kw in jobs:
    t0 = time.time()
    cfg = TrainConfig.for_model(model, experiment=f"r1_{model}", **kw)
    try:
        _, history = train(cfg, train_ds, test_ds, resume=True)
        results[model] = {"last": history[-1] if history else None,
                          "wall_s": round(time.time() - t0, 1)}
        print(model, json.dumps(results[model]), flush=True)
    except Exception as e:
        results[model] = {"error": str(e)}
        print(model, "FAILED:", e, flush=True)
    with open("log/round1_results.json", "w") as f:
        json.dump(results, f, indent=2)
print("ALL DONE", flush=True)
