"""Point-cloud preprocessing: distance cut, RANSAC plane removal, outlier
rejection, DBSCAN clustering.

TPU-native re-design of the reference's Open3D calls
(point_collect/collect.py): the compute-heavy stages (RANSAC hypothesis
scoring, kNN/range-count outlier tests, per-cluster FPS) run as jitted JAX
programs with static padded shapes; only the inherently dynamic-shape
bookkeeping (index compaction, union-find) stays on host numpy, with a C++
fast path for DBSCAN in native/ (ctypes, optional).

Parity map:
- clip_distance               -> collect.py:71-78
- ransac_plane / remove_plane -> collect.py:6-28 (Open3D segment_plane,
                                  thresh 0.006, 1000 iterations)
- remove_statistical_outlier  -> collect.py:80-90 (nb_neighbors=120,
                                  std_ratio=0.1)
- remove_radius_outlier       -> collect.py:92-102 (nb_points=200, r=0.05)
- dbscan / cluster_point      -> collect.py:30-69 (eps=0.03, min_points=500;
                                  clusters truncated to the min cluster size
                                  by FPS, returned [n_clusters, min_size, C])
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pointnet_like_pose_estimation_tpu.ops import farthest_point_sample

_BUCKET = 2048

# module-level jit so repeated calls share the trace cache; sizes are
# bucketed at the call sites so varying scenes reuse compiled programs
_fps_jit = jax.jit(farthest_point_sample, static_argnums=1)


def _round_up(n: int, q: int) -> int:
    return -(-n // q) * q


def _pad_bucket(points: np.ndarray):
    """Pad [N, C] to a bucketed static length; returns (padded, valid_mask)."""
    n = len(points)
    pad = -(-max(n, 1) // _BUCKET) * _BUCKET
    out = np.zeros((pad, points.shape[1]), np.float32)
    out[:n] = points
    # park padding far away so it is never a neighbor / inlier
    out[n:] = 1e6
    valid = np.zeros(pad, bool)
    valid[:n] = True
    return out, valid


def clip_distance(points: np.ndarray, dis=(0.0, 2.0), axis: int = 2) -> np.ndarray:
    """Keep points whose coordinate on ``axis`` lies in [dis0, dis1]."""
    keep = (points[:, axis] >= dis[0]) & (points[:, axis] <= dis[1])
    return points[keep]


def _best_plane(xyz, valid, key, threshold, num_iterations=1000, chunk=100):
    """Score plane hypotheses; returns (best normal, best offset). Traced
    body shared by the staged `_ransac_score` and the fused `_clean_masks`
    so both paths pick the identical plane for a given seed."""
    N = xyz.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.sum(p)
    idx = jax.random.choice(key, N, shape=(num_iterations, 3), p=p)
    tri = xyz[idx]                                            # [H, 3, 3]
    n = jnp.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    d = -jnp.sum(n * tri[:, 0], axis=-1)                      # [H]

    def count(args):
        nn, dd = args
        dist = jnp.abs(xyz @ nn.T + dd[None, :])              # [N, hc]
        return jnp.sum((dist <= threshold) & valid[:, None], axis=0)

    counts = jax.lax.map(
        count, (n.reshape(-1, chunk, 3), d.reshape(-1, chunk))
    ).reshape(-1)
    best = jnp.argmax(counts)
    return n[best], d[best]


_ransac_score = jax.jit(_best_plane, static_argnames=("num_iterations", "chunk"))


@functools.partial(jax.jit, static_argnames=("num_iterations", "chunk"))
def _clean_masks(xyz, valid, key, plane_threshold, radius, nb_points,
                 num_iterations=1000, chunk=512):
    """Plane fit + plane-inlier rejection + radius-outlier test as ONE
    compiled program: over the tunneled single-chip setup the staged path
    pays a device round trip per stage (plus a re-pad and second H2D of the
    surviving cloud); fusing them halves the dispatch count of the
    clean-up phase. Semantics match remove_plane -> remove_radius_outlier
    exactly: neighbors are counted among the points that survive the plane
    cut (self excluded)."""
    n, d = _best_plane(xyz, valid, key, plane_threshold,
                       num_iterations=num_iterations)
    keep = valid & (jnp.abs(xyz @ n + d) > plane_threshold)

    def row_block(rows):
        d2 = (
            jnp.sum(rows**2, -1, keepdims=True)
            - 2.0 * rows @ xyz.T
            + jnp.sum(xyz**2, -1)[None, :]
        )
        within = (d2 <= radius * radius) & keep[None, :]
        return jnp.sum(within, axis=-1) - 1

    counts = jax.lax.map(row_block, xyz.reshape(-1, chunk, 3)).reshape(-1)
    return keep & (counts >= nb_points)


def clean_masks_async(
    points: np.ndarray,
    plane_threshold: float = 0.006,
    num_iterations: int = 1000,
    radius_nb_points: int = 200,
    radius: float = 0.05,
    seed: int = 0,
) -> jax.Array:
    """Dispatch the fused clean program and return the (padded) keep-mask
    WITHOUT forcing it — lets a streaming caller overlap host work with the
    device execution (JAX dispatch is asynchronous)."""
    xyz, valid = _pad_bucket(points[:, :3])
    return _clean_masks(
        jnp.asarray(xyz),
        jnp.asarray(valid),
        jax.random.PRNGKey(seed),
        plane_threshold,
        radius,
        radius_nb_points,
        num_iterations=num_iterations,
    )


# Above this raw size the STAGED path wins: the fused program's outlier
# stage must count neighbors over the full padded cloud (static shapes),
# while staging shrinks the array on host after plane removal — measured
# crossover on v5e: fused 33 vs staged 90 ms at 18k points, but 270 vs
# 156 ms at 298k (log/e2e_latency.json frame300k, round 5).
_FUSED_CLEAN_MAX_POINTS = 65536


def clean_scene(points: np.ndarray, **kw) -> np.ndarray:
    """remove_plane + remove_radius_outlier (collect.py:6-28,92-102).

    Small scenes: one fused device dispatch (dispatch overhead dominates).
    Large scenes: staged with a host shrink between the stages (compute on
    the post-plane remainder dominates). Outputs are identical either way.
    """
    if len(points) > _FUSED_CLEAN_MAX_POINTS:
        num_iterations = kw.pop("num_iterations", 1000)
        pts = remove_plane(
            points,
            distance_threshold=kw.pop("plane_threshold", 0.006),
            num_iterations=num_iterations,
            seed=kw.pop("seed", 0),
        )
        return remove_radius_outlier(
            pts,
            nb_points=kw.pop("radius_nb_points", 200),
            radius=kw.pop("radius", 0.05),
        )
    mask = np.asarray(clean_masks_async(points, **kw))
    return points[mask[: len(points)]]


def ransac_plane(
    points: np.ndarray,
    distance_threshold: float = 0.006,
    num_iterations: int = 1000,
    seed: int = 0,
):
    """Fit the dominant plane; returns (plane (a,b,c,d), inlier mask)."""
    xyz, valid = _pad_bucket(points[:, :3])
    n, d = _ransac_score(
        jnp.asarray(xyz),
        jnp.asarray(valid),
        jax.random.PRNGKey(seed),
        distance_threshold,
        num_iterations=num_iterations,
    )
    n, d = np.asarray(n), float(d)
    dist = np.abs(points[:, :3] @ n + d)
    return np.array([*n, d]), dist <= distance_threshold


def remove_plane(points: np.ndarray, **kw) -> np.ndarray:
    """Delete the dominant plane's inliers (table removal, collect.py:6-28)."""
    _, inliers = ransac_plane(points, **kw)
    return points[~inliers]


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _knn_mean_dist(xyz, valid, k, chunk=512):
    """Mean distance to the k nearest valid neighbors, per point (chunked so
    the [N, N] matrix never materializes in HBM)."""
    big = 1e12

    def row_block(rows):
        d2 = (
            jnp.sum(rows**2, -1, keepdims=True)
            - 2.0 * rows @ xyz.T
            + jnp.sum(xyz**2, -1)[None, :]
        )
        d2 = jnp.where(valid[None, :], d2, big)
        neg_top, _ = jax.lax.top_k(-d2, k + 1)                # includes self (0)
        d2k = -neg_top[:, 1:]
        return jnp.mean(jnp.sqrt(jnp.maximum(d2k, 0.0)), axis=-1)

    return jax.lax.map(row_block, xyz.reshape(-1, chunk, 3)).reshape(-1)


def remove_statistical_outlier(
    points: np.ndarray, nb_neighbors: int = 120, std_ratio: float = 0.1
) -> np.ndarray:
    """Drop points whose mean kNN distance exceeds mean + ratio*std
    (Open3D remove_statistical_outlier semantics, collect.py:80-90)."""
    if len(points) <= nb_neighbors:
        return points
    xyz, valid = _pad_bucket(points[:, :3])
    md = np.asarray(_knn_mean_dist(jnp.asarray(xyz), jnp.asarray(valid), nb_neighbors))
    md = md[: len(points)]
    thresh = md.mean() + std_ratio * md.std()
    return points[md <= thresh]


@functools.partial(jax.jit, static_argnames=("chunk",))
def _range_count(xyz, valid, radius, chunk=512):
    """Number of valid points within ``radius``, per point (excl. self)."""

    def row_block(rows):
        d2 = (
            jnp.sum(rows**2, -1, keepdims=True)
            - 2.0 * rows @ xyz.T
            + jnp.sum(xyz**2, -1)[None, :]
        )
        within = (d2 <= radius * radius) & valid[None, :]
        return jnp.sum(within, axis=-1) - 1

    return jax.lax.map(row_block, xyz.reshape(-1, chunk, 3)).reshape(-1)


def remove_radius_outlier(
    points: np.ndarray, nb_points: int = 200, radius: float = 0.05
) -> np.ndarray:
    """Drop points with fewer than nb_points neighbors within radius
    (collect.py:92-102)."""
    xyz, valid = _pad_bucket(points[:, :3])
    cnt = np.asarray(_range_count(jnp.asarray(xyz), jnp.asarray(valid), radius))
    return points[cnt[: len(points)] >= nb_points]


def _neighbor_counts_and_lists(xyz: np.ndarray, eps: float):
    """Grid-hashed eps-neighbor counts + adjacency (host, vectorized per cell)."""
    cells = np.floor(xyz / eps).astype(np.int64)
    # pack 3-d cell coords into one int key
    key = (cells[:, 0] + (1 << 20)) * (1 << 42) + (cells[:, 1] + (1 << 20)) * (1 << 21) + (
        cells[:, 2] + (1 << 20)
    )
    order = np.argsort(key)
    sk = key[order]
    uniq = np.unique(sk)
    lo = np.searchsorted(sk, uniq, side="left")
    hi = np.searchsorted(sk, uniq, side="right")
    cell_map = {int(u): order[lo[i] : hi[i]] for i, u in enumerate(uniq)}

    neigh_of = []
    eps2 = eps * eps
    for i in range(len(xyz)):
        c = cells[i]
        cand = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    k2 = (c[0] + dx + (1 << 20)) * (1 << 42) + (c[1] + dy + (1 << 20)) * (
                        1 << 21
                    ) + (c[2] + dz + (1 << 20))
                    got = cell_map.get(int(k2))
                    if got is not None:
                        cand.append(got)
        cand = np.concatenate(cand)
        d2 = np.sum((xyz[cand] - xyz[i]) ** 2, axis=-1)
        neigh_of.append(cand[d2 <= eps2])
    return neigh_of


def dbscan(
    points: np.ndarray,
    eps: float = 0.03,
    min_points: int = 500,
    *,
    use_native: bool = True,
) -> np.ndarray:
    """DBSCAN labels (noise = -1), Open3D cluster_dbscan semantics.

    Dispatches to the native C++ grid-hash kernel (native/pcnative.cpp, via
    ctypes) when available — the reference's equivalent was Open3D's C++
    backend (collect.py:42) — with an identical-semantics numpy fallback.
    Note Open3D counts the point itself as a neighbor; so do we.
    """
    if use_native:
        try:
            from pointnet_like_pose_estimation_tpu.pipeline import native_dbscan

            labels = native_dbscan.dbscan(points[:, :3].astype(np.float64), eps, min_points)
            if labels is not None:
                return labels
        except Exception:
            pass
    xyz = points[:, :3].astype(np.float64)
    n = len(xyz)
    if n > 50_000:
        import warnings

        warnings.warn(
            f"numpy DBSCAN fallback on {n} points (per-point Python loop; "
            "real-frame scale ~300k points takes minutes). The native kernel "
            "(native/pcnative.cpp) is auto-built by pipeline.native_dbscan on "
            "first use — this fallback means that g++ build failed.",
            RuntimeWarning,
            stacklevel=2,
        )
    neigh = _neighbor_counts_and_lists(xyz, eps)
    core = np.array([len(v) >= min_points for v in neigh])
    labels = np.full(n, -1, np.int64)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS over core connectivity
        labels[i] = cluster
        stack = [i]
        while stack:
            j = stack.pop()
            for q in neigh[j]:
                if labels[q] == -1:
                    labels[q] = cluster
                    if core[q]:
                        stack.append(q)
        cluster += 1
    return labels


def cluster_point(
    points: np.ndarray, eps: float = 0.03, min_points: int = 500
) -> np.ndarray | None:
    """DBSCAN -> truncate every cluster to the smallest cluster's size via
    FPS -> [n_clusters, min_size, C] (collect.py:30-69). None when no
    cluster is found (the README's "No -> collect again" branch)."""
    labels = dbscan(points, eps, min_points)
    n_clusters = labels.max() + 1
    if n_clusters <= 0:
        return None
    groups = [np.where(labels == c)[0] for c in range(n_clusters)]
    min_size = min(len(g) for g in groups)
    out = np.zeros((n_clusters, min_size, points.shape[1]), np.float32)
    # batched FPS on device. Every dimension that varies per scene is padded
    # to a bucket so jit reuses one compiled program across scenes instead of
    # recompiling per (K, max_size, min_size): FPS is greedy, so selection t
    # never depends on how many later selections exist (prefix-stable), and
    # duplicate pads of an already-selected point keep min-distance 0 so
    # argmax (first-index tie-break) never picks them while real points
    # remain — bucketed-then-sliced output is exactly the unbucketed output.
    max_size = max(len(g) for g in groups)
    n_bucket = _round_up(max_size, 256)
    s_bucket = min(_round_up(min_size, 256), n_bucket)
    k_bucket = _round_up(n_clusters, 4)
    batch = np.stack(
        [
            np.concatenate(
                [points[g, :3], np.tile(points[g[:1], :3], (n_bucket - len(g), 1))]
            )
            for g in groups
        ]
        + [np.tile(points[groups[0][:1], :3], (n_bucket, 1))] * (k_bucket - n_clusters)
    ).astype(np.float32)
    idx = np.asarray(_fps_jit(jnp.asarray(batch), s_bucket))[:n_clusters, :min_size]
    for c, g in enumerate(groups):
        padded = np.concatenate([g, np.tile(g[:1], n_bucket - len(g))])
        out[c] = points[padded[idx[c]]]
    return out
