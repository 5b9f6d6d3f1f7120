"""On-chip validation of the Pallas kernels and the PointNet++ hot path.

VERDICT r1 item 2: CPU-interpret tests can stay green while Mosaic rejects a
kernel on real hardware. This script runs ON THE REAL TPU (no platform pin):

1. fps_pallas compiles + runs and matches the XLA FPS index-exactly.
2. ball_query_pallas / ball_query_multi_pallas compile + run and match
   ops.query_ball_point index-exactly (reference pointnet2_utils.py:70-90
   semantics).
3. pointnet2_cls_ssg forward parity: PLPE grouping/fps = pallas vs xla on
   identical params/inputs (the guard for auto-dispatch, kernels/flags.py).

Writes log/tpu_checks.json. Exit code 0 = every check passed.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointnet_like_pose_estimation_tpu.kernels import (
    ball_query_multi_pallas,
    ball_query_pallas,
    flags,
    fps_pallas,
)
from pointnet_like_pose_estimation_tpu.models import get_model_spec
from pointnet_like_pose_estimation_tpu.ops import (
    farthest_point_sample,
    query_ball_point,
)

results: dict[str, str] = {}
backend = jax.default_backend()
print(f"backend={backend} devices={jax.devices()}", flush=True)
assert backend in ("tpu", "axon"), f"not a TPU backend: {backend}"

rng = np.random.default_rng(13)
pts = jnp.asarray(rng.standard_normal((8, 1024, 3)), jnp.float32)

# 1. FPS
got = jax.block_until_ready(fps_pallas(pts, 256))
flags.set_impls(fps="xla")
try:
    want = farthest_point_sample(pts, 256)
finally:
    flags.set_impls(fps="auto")
np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
results["fps_pallas"] = "ok"
print("fps_pallas: ok", flush=True)

# 2. ball query (single + fused multi-scale)
cent = pts[:, :128, :]
idx = jax.block_until_ready(ball_query_pallas(pts, cent, 0.4, 32))
flags.set_impls(grouping="xla")
try:
    want_idx = query_ball_point(0.4, 32, pts, cent)
    radii, ks = (0.1, 0.2, 0.4), (16, 32, 128)
    want_multi = [query_ball_point(r, k, pts, cent) for r, k in zip(radii, ks)]
finally:
    flags.set_impls(grouping="auto")
np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
results["ball_query_pallas"] = "ok"
print("ball_query_pallas: ok", flush=True)

multi = jax.block_until_ready(ball_query_multi_pallas(pts, cent, radii, ks))
off = 0
for w, k in zip(want_multi, ks):
    np.testing.assert_array_equal(np.asarray(multi[:, :, off : off + k]), np.asarray(w))
    off += k
results["ball_query_multi_pallas"] = "ok"
print("ball_query_multi_pallas: ok", flush=True)

# 3. model forward parity, pallas vs xla dispatch (SSG and MSG backbones)
for name in ("pointnet2_cls_ssg", "pointnet2_cls_msg"):
    spec = get_model_spec(name)
    model = spec.make(num_classes=7)
    variables = model.init(jax.random.key(0), pts, train=False)
    flags.set_impls(fps="pallas", grouping="pallas")
    try:
        out_p = model.apply(variables, pts, train=False)
        flags.set_impls(fps="xla", grouping="xla")
        out_x = model.apply(variables, pts, train=False)
    finally:
        flags.set_impls(fps="auto", grouping="auto")
    np.testing.assert_allclose(
        np.asarray(out_p[0]), np.asarray(out_x[0]), rtol=5e-3, atol=1e-4
    )
    results[f"{name}_forward_parity"] = "ok"
    print(f"{name} pallas-vs-xla forward parity: ok", flush=True)

# 4. fused SA inference executor (Mosaic compile + numeric parity vs
# model.apply eval; models/fast_infer.py)
from pointnet_like_pose_estimation_tpu.models.fast_infer import (  # noqa: E402
    build_pn2_msg_infer,
    build_pn2_ssg_infer,
)
from pointnet_like_pose_estimation_tpu.train import TrainConfig  # noqa: E402
from pointnet_like_pose_estimation_tpu.train.loop import build_state  # noqa: E402

for name, builder in (
    ("pointnet2_cls_ssg", build_pn2_ssg_infer),
    ("pointnet2_cls_msg", build_pn2_msg_infer),
):
    cfg = TrainConfig.for_model(name, num_points=1024)
    _, model, state = build_state(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    want = model.apply(variables, pts, train=False)[0]
    got = builder(variables)(pts)[0]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-3, atol=1e-4
    )
    results[f"{name}_fused_infer"] = "ok"
    print(f"{name} fused-SA inference parity: ok", flush=True)

os.makedirs("log", exist_ok=True)
with open("log/tpu_checks.json", "w") as f:
    json.dump({"backend": backend, "checks": results}, f, indent=2)
print("ALL TPU CHECKS PASSED", flush=True)
