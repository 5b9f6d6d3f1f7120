"""ModelNet10/40 dataset loader (benchmark-compat path).

Parity: data_utils/ModelNetDataLoader.py:49-143 — catfile + split list
layout (``modelnet{10,40}_shape_names.txt``, ``modelnet{10,40}_{split}.txt``,
``<shape>/<shape>_NNNN.txt`` CSV rows of x,y,z,nx,ny,nz), per-cloud unit-
sphere normalization (:17-22), optional uniform FPS resampling with an
on-disk preprocessed cache (:92-117; ``.npz`` here instead of pickle), and
truncate-to-first-npoints otherwise.

The FPS pass runs batched on device (ops.farthest_point_sample) instead of
the reference's per-cloud numpy loop.
"""

from __future__ import annotations

import os

import numpy as np

from pointnet_like_pose_estimation_tpu.data.dataset import PoseDataset, _batched_fps


def pc_normalize(pc: np.ndarray) -> np.ndarray:
    """Per-cloud centroid-subtract + unit-sphere scale (ModelNetDataLoader.py:17-22)."""
    centroid = np.mean(pc, axis=0)
    pc = pc - centroid
    m = np.max(np.sqrt(np.sum(pc**2, axis=1)))
    return pc / m


class ModelNetDataset:
    """Array-backed ModelNet loader.

    Attributes after load: points [M, npoints, 3 or 6] float32 (normalized
    xyz), labels [M] int32.
    """

    def __init__(
        self,
        root: str,
        num_category: int = 40,
        split: str = "train",
        npoints: int = 1024,
        uniform: bool = False,
        use_normals: bool = False,
        cache: bool = True,
    ):
        self.root = root
        self.npoints = npoints
        self.uniform = uniform
        self.use_normals = use_normals
        catfile = os.path.join(root, f"modelnet{num_category}_shape_names.txt")
        self.cat = [line.rstrip() for line in open(catfile)]
        self.classes = dict(zip(self.cat, range(len(self.cat))))
        ids = [
            line.rstrip()
            for line in open(os.path.join(root, f"modelnet{num_category}_{split}.txt"))
        ]
        names = ["_".join(x.split("_")[:-1]) for x in ids]
        self.datapath = [
            (names[i], os.path.join(root, names[i], ids[i]) + ".txt")
            for i in range(len(ids))
        ]

        tag = "fps" if uniform else "head"
        cache_path = os.path.join(
            root, f"modelnet{num_category}_{split}_{npoints}pts_{tag}.npz"
        )
        if cache and os.path.exists(cache_path):
            data = np.load(cache_path)
            self.points, self.labels = data["points"], data["labels"]
            return

        raw, labels = [], []
        for name, path in self.datapath:
            pts = np.loadtxt(path, delimiter=",").astype(np.float32)
            raw.append(pts)
            labels.append(self.classes[name])
        if uniform:
            # batched FPS on device over xyz; gather full channels after
            sampled = []
            xyz = [p[:, :3] for p in raw]
            fps_pts = _batched_fps(xyz, npoints)
            # _batched_fps returns gathered xyz; redo gather for normals via
            # nearest matching rows is wasteful — instead FPS indices come
            # from xyz-only clouds identical to p[:, :3], so match by order:
            for p, s in zip(raw, fps_pts):
                if p.shape[1] > 3:
                    # map sampled xyz rows back to source rows
                    # (exact match: sampled points are copies of source rows)
                    idx = _match_rows(p[:, :3], s)
                    sampled.append(p[idx])
                else:
                    sampled.append(s)
            raw = sampled
        else:
            raw = [p[: npoints] for p in raw]
        pts = np.stack(raw).astype(np.float32)
        pts[..., :3] = np.stack([pc_normalize(p[:, :3]) for p in pts])
        if not use_normals:
            pts = pts[..., :3]
        self.points, self.labels = pts, np.asarray(labels, np.int32)
        if cache:
            np.savez_compressed(cache_path, points=self.points, labels=self.labels)

    def __len__(self):
        return len(self.labels)

    def as_pose_dataset(self) -> PoseDataset:
        """Adapt to the training loop's dataset interface (zero pose targets)."""
        m = len(self.labels)
        return PoseDataset(
            points=self.points[..., :3],
            labels=self.labels,
            rot=np.zeros((m, 3), np.float32),
            tran=np.zeros((m, 3), np.float32),
            sign=np.ones(m, np.float32),
        )


def _match_rows(source: np.ndarray, sampled: np.ndarray) -> np.ndarray:
    """Indices of sampled xyz rows within source (exact float match)."""
    lookup = {tuple(row): i for i, row in enumerate(np.asarray(source))}
    return np.asarray([lookup[tuple(row)] for row in np.asarray(sampled)], np.int64)
