"""Microbench: gather backward as XLA scatter-add vs one-hot matmul.

The B=256 train step's backward contains a scatter-add transposing the
SA2 feature gather (f32[131072,128] scatter in the optimized HLO). TPU
scatters serialize badly; the MXU-native alternative is
dFeat[b] = onehot(idx)^T @ dGrouped[b] — segment-sum as matmul. This probe
times both formulations in isolation at the SA2 shape to decide whether
index_points should carry a custom VJP (flag: PLPE_GATHER_VJP=matmul).

Writes log/scatter_bwd_probe.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
from pointnet_like_pose_estimation_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timeit(fn, *args):
    """Sustained timing (utils/profiling.sustained_time) — the round-3
    20-iteration block_until_ready protocol under-measures over the
    tunneled TPU (docs/PERF.md measurement-protocol note)."""
    from pointnet_like_pose_estimation_tpu.utils import sustained_time

    return sustained_time(fn, *args, min_seconds=2.0)


def main():
    rng = np.random.default_rng(0)
    out = {}
    if os.path.exists("log/scatter_bwd_probe.json"):
        out = json.load(open("log/scatter_bwd_probe.json"))
    # SA2 backward shape at B=256: grads [B, S=128, K=64, C=128+3] scatter
    # into [B, N=512, C]; SA1 grads [B,512,32,C_small] exist too but carry
    # no feature gradient (xyz inputs are leaves)
    # b24 (the training batch) first; b64 extrapolates toward the bench
    # batches. The isolated-scatter compile at B=256 exceeds any practical
    # time box (>35 min, observed rounds 3 AND 4) — the b256 effect is
    # measured end-to-end instead by the full-step A/B (scripts/ab_round4.py),
    # whose train-step program compiles normally in either VJP mode.
    shapes = {
        "sa2_b24": (24, 512, 128, 64, 131),
        "sa2_b64": (64, 512, 128, 64, 131),
    }
    if os.environ.get("PLPE_PROBE_B256"):
        shapes["sa2_b256"] = (256, 512, 128, 64, 131)
    for tag, (B, N, S, K, C) in shapes.items():
        feats = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, N, (B, S, K)), jnp.int32)
        g = jnp.asarray(rng.standard_normal((B, S, K, C)), jnp.float32)

        def gather_loss(f, idx=idx, g=g):
            got = jnp.take_along_axis(
                f, idx.reshape(f.shape[0], -1)[..., None], axis=1
            ).reshape(g.shape)
            return jnp.vdot(got, g)

        scatter_bwd = jax.jit(jax.grad(gather_loss))
        t_scatter = timeit(scatter_bwd, feats)

        @jax.jit
        def matmul_bwd(f, idx=idx, g=g):
            # dFeat[b, n, c] = sum_{s,k: idx=n} g[b,s,k,c] == onehot^T @ g
            fi = idx.reshape(idx.shape[0], -1)                 # [B, S*K]
            gf = g.reshape(g.shape[0], -1, g.shape[-1])        # [B, S*K, C]
            onehot = jax.nn.one_hot(fi, f.shape[1], dtype=g.dtype)  # [B,SK,N]
            return jnp.einsum("bkn,bkc->bnc", onehot, gf)

        t_matmul = timeit(matmul_bwd, feats)
        # sanity: same result
        a = jax.jit(jax.grad(gather_loss))(feats)
        b = matmul_bwd(feats)
        err = float(jnp.max(jnp.abs(a - b)))
        out[tag] = {
            "scatter_ms": t_scatter * 1e3,
            "onehot_matmul_ms": t_matmul * 1e3,
            "max_abs_diff": err,
        }
        print(tag, json.dumps(out[tag]), file=sys.stderr, flush=True)
    with open("log/scatter_bwd_probe.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
