"""End-to-end inference graph: clusters -> classify -> 4 pose heads -> grasp.

This finishes the wiring the reference left unimplemented (README.md:5 "the
final program ... not be realized"; intended flow README.md:10-28,
point_collect/test.py:5-16): capture -> clip -> plane removal -> outlier ->
cluster -> per-cluster classification -> one-hot splice -> rotation + sign +
translation + width -> composed grasp pose.

The reference prototyped the 4-head stage with Python threads on one GPU
(mutilthreading/predict_test.py:25-67). Here all four heads AND the
classifier run inside ONE jitted XLA program over the cluster batch — the
scheduler overlaps them on-chip, and the cluster batch can be sharded over a
``data`` mesh axis for multi-host fan-out (clusters partitioned across
hosts, SURVEY §2.8).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from pointnet_like_pose_estimation_tpu.data import augment as aug
from pointnet_like_pose_estimation_tpu.ops import (
    euler_rotation_matrix,
    farthest_point_sample,
    index_points,
    normalize_cloud,
)
from pointnet_like_pose_estimation_tpu.pipeline import preprocess as pp
from pointnet_like_pose_estimation_tpu.train.config import TrainConfig
from pointnet_like_pose_estimation_tpu.train.loop import build_state


@dataclasses.dataclass
class PipelineConfig:
    """Thresholds transcribed from point_collect/{collect,test}.py."""

    clip_range: tuple = (0.0, 2.0)
    clip_axis: int = 2
    plane_threshold: float = 0.006
    plane_iterations: int = 1000
    outlier_method: str = "radius"          # 'radius' | 'statistical' | 'none'
    radius_nb_points: int = 200
    radius: float = 0.05
    stat_nb_neighbors: int = 120
    stat_std_ratio: float = 0.1
    eps: float = 0.03
    min_points: int = 500
    num_points: int = 1024
    num_classes: int = 7
    classifier: str = "pointnet2_cls_ssg"
    dtype: str = "float32"                  # 'bfloat16' halves HBM traffic on TPU


class GraspPipeline:
    """Holds the five models + the fused jitted inference program."""

    def __init__(
        self, cfg: PipelineConfig, models: dict[str, tuple[Any, Any]], mesh=None
    ):
        """models: name -> (flax module, variables) for keys
        classifier/rotation/sign/translation/width.

        With ``mesh`` (axis 'data'), the cluster batch is sharded across
        devices — the multi-host cluster fan-out of SURVEY §2.8 (clusters
        partitioned across hosts instead of the reference's 4 GPU threads).
        """
        self.cfg = cfg
        self.models = models
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._data_sharding = NamedSharding(mesh, P("data"))
            self._infer = jax.jit(
                self._infer_fn,
                in_shardings=self._data_sharding,
                out_shardings=NamedSharding(mesh, P()),
            )
        else:
            self._infer = jax.jit(self._infer_fn)

    @classmethod
    def from_random(cls, cfg: PipelineConfig | None = None, seed: int = 0):
        """Randomly-initialized models (tests / latency benchmarking)."""
        cfg = cfg or PipelineConfig()
        models = {}
        for name, model_name in [
            ("classifier", cfg.classifier),
            ("rotation", "rotation"),
            ("sign", "sign"),
            ("translation", "translation"),
            ("width", "width"),
        ]:
            tcfg = TrainConfig(
                model=model_name,
                num_classes=cfg.num_classes,
                num_points=cfg.num_points,
                seed=seed,
                dtype=cfg.dtype,
            )
            _, model, state = build_state(tcfg)
            models[name] = (model, {"params": state.params, "batch_stats": state.batch_stats})
        return cls(cfg, models)

    @classmethod
    def from_checkpoints(cls, cfg: PipelineConfig, checkpoint_paths: dict[str, str]):
        """Load trained states saved by train.loop.save_checkpoint."""
        from pointnet_like_pose_estimation_tpu.train.loop import load_checkpoint

        models = {}
        for name, path in checkpoint_paths.items():
            model_name = cfg.classifier if name == "classifier" else name
            tcfg = TrainConfig(
                model=model_name, num_classes=cfg.num_classes,
                num_points=cfg.num_points, dtype=cfg.dtype,
            )
            _, model, state = build_state(tcfg)
            state, _ = load_checkpoint(path, state)
            models[name] = (model, {"params": state.params, "batch_stats": state.batch_stats})
        return cls(cfg, models)

    # ---------- preprocessing (host + device stages) ----------

    def preprocess(self, points: np.ndarray) -> np.ndarray | None:
        """Raw cloud [N, C>=3] -> clusters [K, min_size, C] or None."""
        cfg = self.cfg
        pts = pp.clip_distance(points, cfg.clip_range, cfg.clip_axis)
        if len(pts) < cfg.min_points:
            return None
        if cfg.outlier_method == "radius":
            # fused plane+radius clean-up: one device dispatch for the pair
            pts = pp.clean_scene(
                pts,
                plane_threshold=cfg.plane_threshold,
                num_iterations=cfg.plane_iterations,
                radius_nb_points=cfg.radius_nb_points,
                radius=cfg.radius,
            )
        else:
            pts = pp.remove_plane(
                pts,
                distance_threshold=cfg.plane_threshold,
                num_iterations=cfg.plane_iterations,
            )
            if cfg.outlier_method == "statistical":
                pts = pp.remove_statistical_outlier(
                    pts, cfg.stat_nb_neighbors, cfg.stat_std_ratio
                )
        if len(pts) < cfg.min_points:
            return None
        return pp.cluster_point(pts, cfg.eps, cfg.min_points)

    def _resample(self, clusters: np.ndarray) -> np.ndarray:
        """[K, M, C] -> [K, num_points, 3] via FPS (M>=num_points) or
        tile-padding (M<num_points)."""
        K, M, _ = clusters.shape
        xyz = clusters[..., :3].astype(np.float32)
        n = self.cfg.num_points
        if M == n:
            return xyz
        if M > n:
            # bucket the per-scene (K, M) so jit reuses one compiled FPS
            # across scenes (pads are duplicate points at higher indices —
            # never selected while real points remain, see cluster_point)
            kb, mb = -(-K // 4) * 4, -(-M // 256) * 256
            padded = np.tile(xyz[:, :1], (1, mb, 1))
            padded[:, :M] = xyz
            padded = np.concatenate([padded, np.tile(padded[:1], (kb - K, 1, 1))])
            idx = np.asarray(pp._fps_jit(jnp.asarray(padded), n))[:K]
            return np.take_along_axis(xyz, idx[..., None], axis=1)
        reps = -(-n // M)
        return np.tile(xyz, (1, reps, 1))[:, :n]

    # ---------- fused classify -> pose program ----------

    def _apply(self, name, *args):
        model, variables = self.models[name]
        return model.apply(variables, *args, train=False)

    def _infer_fn(self, xyz: jax.Array):
        """xyz: [K, num_points, 3] raw (unnormalized) cluster clouds."""
        mean = jnp.mean(xyz, axis=1)                          # translation residual input
        normed = normalize_cloud(xyz)
        log_probs, _, pred_class = self._apply("classifier", normed)
        spliced = aug.splice_onehot(normed, pred_class, self.cfg.num_classes)
        f32 = lambda x: x.astype(jnp.float32)                 # bf16 compute, f32 outputs
        rot = f32(self._apply("rotation", spliced))           # [K, 3] euler deg, |z|
        sign_prob, hard_sign = map(f32, self._apply("sign", spliced))  # [K, 1] each
        tran = f32(self._apply("translation", spliced, mean)) # [K, 3] meters
        width = f32(self._apply("width", spliced))            # [K, 1]
        # recompose the signed z angle stripped by the loader
        # (ModelDataLoader.py:88-89), then the grasp rotation matrix
        signed_rot = rot.at[:, 2].multiply(hard_sign[:, 0])
        R = euler_rotation_matrix(jnp.radians(signed_rot))
        return {
            "log_probs": f32(log_probs),
            "pred_class": pred_class,
            "rotation_deg": signed_rot,
            "rotation_matrix": R,
            "sign_prob": sign_prob[:, 0],
            "translation": tran,
            "width": width[:, 0],
        }

    def infer_clusters(self, clusters: np.ndarray) -> dict:
        """Clusters [K, M, C] -> grasp estimates (device dict). With a mesh,
        K is padded up to a multiple of the data axis and sharded."""
        xyz = self._resample(clusters)
        K = len(xyz)
        if self.mesh is not None:
            n = self.mesh.shape["data"]
            pad = (-K) % n
            if pad:
                xyz = np.concatenate([xyz, np.tile(xyz[:1], (pad, 1, 1))])
            xyz = jax.device_put(jnp.asarray(xyz), self._data_sharding)
            out = jax.device_get(self._infer(xyz))
            return {k: v[:K] for k, v in out.items()}
        # bucket K so varying cluster counts share one compiled program
        pad = (-K) % 4
        if pad:
            xyz = np.concatenate([xyz, np.tile(xyz[:1], (pad, 1, 1))])
        out = jax.device_get(self._infer(jnp.asarray(xyz)))
        return {k: v[:K] for k, v in out.items()}

    # ---------- fused scene program: everything after DBSCAN in ONE dispatch ----------

    def _scene_infer_fn(self, xyz, idx_batch, min_size, *, s_bucket, branch):
        """[P_b, 3] cleaned points + [K_b, n_bucket] cluster gather indices ->
        (grasp dict, global indices of the truncated clusters). Fuses the
        cluster-truncation FPS (cluster_point), the resample FPS/tile
        (_resample), and the 5-model inference into one compiled program;
        `min_size` is a traced scalar so it never forces a recompile.
        Reproduces the staged semantics exactly: positions >= min_size are
        replaced by copies of each cluster's FPS start point, which hold
        min-distance 0 and lose every first-index argmax tie-break, so the
        second FPS selects as if the array were sliced to min_size."""
        clusters = xyz[idx_batch]                             # [K_b, n_bucket, 3]
        cidx = farthest_point_sample(clusters, s_bucket)      # [K_b, s_bucket]
        trunc = jnp.take_along_axis(clusters, cidx[..., None], axis=1)
        ar = jnp.arange(s_bucket)
        masked = jnp.where((ar < min_size)[None, :, None], trunc, trunc[:, :1])
        n = self.cfg.num_points
        if branch == "fps":                                   # min_size > n
            ridx = farthest_point_sample(masked, n)
            xin = jnp.take_along_axis(masked, ridx[..., None], axis=1)
        elif branch == "exact":                               # min_size == n
            xin = trunc[:, :n]
        else:                                                 # min_size < n: tile
            xin = jnp.take(masked, jnp.arange(n) % min_size, axis=1)
        cglobal = jnp.take_along_axis(idx_batch, cidx, axis=1)
        return self._infer_fn(xin), cglobal

    def _infer_scene(self, pts: np.ndarray, labels: np.ndarray, sync: bool = True):
        """Cleaned cloud + DBSCAN labels -> grasp dict, single device
        dispatch. Output-identical to cluster_point -> infer_clusters.
        With sync=False, returns an un-fetched handle for _finish_scene so
        a streaming caller can overlap the device execution."""
        n_clusters = int(labels.max()) + 1
        if n_clusters <= 0:
            return None
        groups = [np.where(labels == c)[0] for c in range(n_clusters)]
        min_size = min(len(g) for g in groups)
        max_size = max(len(g) for g in groups)
        rnd = lambda v, q: -(-v // q) * q
        n_bucket = rnd(max_size, 256)
        s_bucket = min(rnd(min_size, 256), n_bucket)
        k_bucket = rnd(n_clusters, 4)
        idx_batch = np.stack(
            [np.concatenate([g, np.tile(g[:1], n_bucket - len(g))]) for g in groups]
            + [np.tile(groups[0][:1], n_bucket)] * (k_bucket - n_clusters)
        ).astype(np.int32)
        xyz = np.zeros((rnd(len(pts), 2048), 3), np.float32)
        xyz[: len(pts)] = pts[:, :3]
        n = self.cfg.num_points
        branch = "fps" if min_size > n else ("exact" if min_size == n else "tile")
        if not hasattr(self, "_scene_jit"):
            self._scene_jit = jax.jit(
                self._scene_infer_fn, static_argnames=("s_bucket", "branch")
            )
        out, cglobal = self._scene_jit(
            jnp.asarray(xyz), jnp.asarray(idx_batch),
            jnp.asarray(min_size, jnp.int32), s_bucket=s_bucket, branch=branch,
        )
        packed = (out, cglobal, pts, n_clusters, min_size)
        return self._finish_scene(packed) if sync else packed

    @staticmethod
    def _finish_scene(packed) -> dict:
        """Force a _infer_scene(sync=False) handle into the result dict."""
        out, cglobal, pts, n_clusters, min_size = packed
        res = {k: v[:n_clusters] for k, v in jax.device_get(out).items()}
        res["clusters"] = pts[np.asarray(cglobal)[:n_clusters, :min_size]]
        return res

    def stream(self, scenes):
        """Pipelined serving for a capture loop (the reference streamed
        640x480@30fps, camera_test/camera.json): yields one grasp dict (or
        None) per raw scene, in order, with host and device work
        overlapped. While the device executes frame t-1's fused inference
        and frame t+1's fused clean-up, the host runs frame t's DBSCAN and
        cluster indexing — sustained throughput approaches
        max(host-per-frame, device-per-frame) instead of their sum, and
        per-frame results are bit-identical to __call__. Mesh / non-radius
        configs fall back to sequential __call__."""
        cfg = self.cfg
        if self.mesh is not None or cfg.outlier_method != "radius":
            for pts in scenes:
                yield self(pts)
            return

        _END = object()

        def start_clean(raw):
            """Host clip + async dispatch of the fused clean program."""
            pts = pp.clip_distance(raw, cfg.clip_range, cfg.clip_axis)
            if len(pts) < cfg.min_points:
                return None
            return pts, pp.clean_masks_async(
                pts, plane_threshold=cfg.plane_threshold,
                num_iterations=cfg.plane_iterations,
                radius_nb_points=cfg.radius_nb_points, radius=cfg.radius,
            )

        def resolve(cur):
            """Clean mask -> DBSCAN -> async infer dispatch (no fetch)."""
            if cur is None:
                return None
            pts, mask_dev = cur
            cleaned = pts[np.asarray(mask_dev)[: len(pts)]]
            if len(cleaned) < cfg.min_points:
                return None
            labels = pp.dbscan(cleaned, cfg.eps, cfg.min_points)
            return self._infer_scene(cleaned, labels, sync=False)

        it = iter(scenes)
        try:
            cur = start_clean(next(it))
        except StopIteration:
            return
        pending = []                                  # one-deep infer lookbehind
        while cur is not _END:
            try:
                nxt = start_clean(next(it))           # dispatch clean(t+1) first
            except StopIteration:
                nxt = _END
            pending.append(resolve(cur))              # DBSCAN(t) overlaps device
            while len(pending) > 1:
                head = pending.pop(0)
                yield None if head is None else self._finish_scene(head)
            cur = nxt
        for head in pending:
            yield None if head is None else self._finish_scene(head)

    def __call__(self, points: np.ndarray) -> dict | None:
        """Full raw-cloud -> grasp pipeline; None when no clusters found.

        On the default single-chip radius path the whole scene costs TWO
        device dispatches — clean_scene (plane+outlier) and _infer_scene
        (truncate+resample+classify+pose) — with only DBSCAN's union-find
        on host between them. Mesh / non-radius configs use the staged
        path, whose outputs are identical."""
        cfg = self.cfg
        if self.mesh is None and cfg.outlier_method == "radius":
            pts = pp.clip_distance(points, cfg.clip_range, cfg.clip_axis)
            if len(pts) < cfg.min_points:
                return None
            pts = pp.clean_scene(
                pts, plane_threshold=cfg.plane_threshold,
                num_iterations=cfg.plane_iterations,
                radius_nb_points=cfg.radius_nb_points, radius=cfg.radius,
            )
            if len(pts) < cfg.min_points:
                return None
            return self._infer_scene(pts, pp.dbscan(pts, cfg.eps, cfg.min_points))
        clusters = self.preprocess(points)
        if clusters is None:
            return None
        out = self.infer_clusters(clusters)
        out["clusters"] = clusters
        return out
