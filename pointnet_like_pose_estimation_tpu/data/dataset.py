"""Dataset build/pack/load and batch iteration.

Replaces the reference's txt-per-cloud layout + torch DataLoader
(data_utils/ModelDataLoader.py) with a packed ``.npz`` (one memory-mappable
array per field) and device-side batched FPS during generation:

- generation: dense surface lattices (generators.py) are padded, stacked and
  FPS'd to 1024 points **in batch on the accelerator** via
  ops.farthest_point_sample — the reference runs a per-cloud numpy FPS loop
  on the host (Cube.py:102-123). Rotation/translation are applied after
  sampling, matching the reference order (build_data.py:71-74: construct ->
  FPS -> rotate -> translate).
- split: the reference fixes per-class indices 1..6001 train / 6002..8000
  test (ModelDataLoader.py:56-58); we keep that 6001/8000 ratio for any
  per-class count.
- loading: ``load_dataset`` applies the loader's sign convention
  (ModelDataLoader.py:88-89): ``sign = sign(rot_z)``, ``rot_z = |rot_z|``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from pointnet_like_pose_estimation_tpu.data import generators
from pointnet_like_pose_estimation_tpu.data.generators import CATEGORIES
from pointnet_like_pose_estimation_tpu.ops import farthest_point_sample


@dataclasses.dataclass
class PoseDataset:
    """In-memory dataset: the loader 5-tuple as arrays.

    points: [M, N, 3] float32 (axis-aligned FPS'd, then rotated+translated)
    labels: [M] int32 category ids (CATEGORIES order)
    rot:    [M, 3] float32 Euler degrees, z-component absolute
    tran:   [M, 3] float32 meters
    sign:   [M] float32 sign of the original z Euler angle (±1 or 0)
    width:  [M] float32 grasp width in meters — smallest horizontal extent of
            the axis-aligned surface (where a parallel gripper closes). The
            reference's width head (model/width.py) never had a training
            target (the loader 5-tuple carries none); this completes it.
    """

    points: np.ndarray
    labels: np.ndarray
    rot: np.ndarray
    tran: np.ndarray
    sign: np.ndarray
    width: np.ndarray | None = None

    def __post_init__(self):
        if self.width is None:
            self.width = np.zeros((len(self.labels),), np.float32)

    def __len__(self) -> int:
        return len(self.labels)


_FPS_CHUNK = 64


def _batched_fps(dense: list[np.ndarray], n_points: int) -> np.ndarray:
    """FPS a ragged list of dense clouds to n_points each, on device.

    Clouds are padded to a bucketed length by repeating their first point —
    a zero-distance duplicate can never be selected before every real point,
    so padding is invisible to FPS.
    """
    out = np.empty((len(dense), n_points, 3), dtype=np.float32)
    fps = jax.jit(farthest_point_sample, static_argnums=1)
    for lo in range(0, len(dense), _FPS_CHUNK):
        chunk = dense[lo : lo + _FPS_CHUNK]
        max_len = max(len(c) for c in chunk)
        pad_len = -(-max_len // 1024) * 1024  # bucket to limit recompiles
        batch = np.stack(
            [
                np.concatenate([c, np.tile(c[:1], (pad_len - len(c), 1))])
                for c in chunk
            ]
        ).astype(np.float32)
        idx = np.asarray(fps(jnp.asarray(batch), n_points))
        out[lo : lo + len(chunk)] = np.take_along_axis(batch, idx[..., None], axis=1)
    return out


def build_dataset(
    num_per_class: int,
    *,
    seed: int = 0,
    n_points: int = 1024,
    categories=CATEGORIES,
    path: str | None = None,
) -> str | dict:
    """Generate the synthetic 7-class pose dataset.

    Equivalent of data_build/build_data.py:26-174 (which spawns 7 host
    threads); here generation is sequential on host for the lattices and
    batched on device for FPS.

    Returns the npz path if ``path`` given, else the raw field dict.
    """
    rng = np.random.default_rng(seed)
    all_pts, labels, rots, trans, widths = [], [], [], [], []
    for label, cat in enumerate(categories):
        dense, params = [], []
        for _ in range(num_per_class):
            p = generators.sample_category_params(cat, rng)
            dense.append(generators.dense_surface(p))
            params.append(p)
            # grasp width: smallest horizontal extent of the axis-aligned
            # surface (parallel-gripper closing span); cube -> side,
            # cylinder -> diameter
            widths.append(float(np.ptp(dense[-1][:, :2], axis=0).min()))
        sampled = _batched_fps(dense, n_points)              # [n, N, 3] axis-aligned
        for i, p in enumerate(params):
            ang = np.radians([p["phi"], p["theta"], p["psi"]])
            c, s = np.cos(ang), np.sin(ang)
            Rx = np.array([[1, 0, 0], [0, c[0], -s[0]], [0, s[0], c[0]]])
            Ry = np.array([[c[1], 0, s[1]], [0, 1, 0], [-s[1], 0, c[1]]])
            Rz = np.array([[c[2], -s[2], 0], [s[2], c[2], 0], [0, 0, 1]])
            R = Rx @ Ry @ Rz
            t = np.array([p["px"], p["py"], p["pz"]])
            all_pts.append((sampled[i] @ R.T + t).astype(np.float32))
            rots.append([p["phi"], p["theta"], p["psi"]])
            trans.append(t)
            labels.append(label)
    fields = {
        "points": np.stack(all_pts),
        "labels": np.asarray(labels, np.int32),
        "rot": np.asarray(rots, np.float32),
        "tran": np.asarray(trans, np.float32),
        "width": np.asarray(widths, np.float32),
        "num_per_class": np.asarray(num_per_class),
    }
    if path is not None:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.savez_compressed(path, **fields)
        return path
    return fields


def _split_count(n: int) -> int:
    """Per-class train count preserving the reference 6001/8000 ratio
    (ModelDataLoader.py:56-58)."""
    return max(1, min(n - 1, round(n * 6001 / 8000))) if n > 1 else n


def load_dataset(src: str | dict, split: str = "train") -> PoseDataset:
    """Load a packed dataset and apply the loader-side sign convention."""
    data = dict(np.load(src)) if isinstance(src, str) else src
    n = int(data["num_per_class"])
    n_train = _split_count(n)
    per_class_idx = np.arange(n) < n_train
    keep = np.tile(per_class_idx if split == "train" else ~per_class_idx, len(data["labels"]) // n)
    rot = data["rot"][keep].copy()
    sign = np.sign(rot[:, 2]).astype(np.float32)
    rot[:, 2] = np.abs(rot[:, 2])
    width = (
        data["width"][keep]
        if "width" in data
        else np.zeros((int(keep.sum()),), np.float32)
    )
    return PoseDataset(
        points=data["points"][keep],
        labels=data["labels"][keep],
        rot=rot,
        tran=data["tran"][keep],
        sign=sign,
        width=width,
    )


def load_reference_layout(
    root: str,
    split: str = "train",
    *,
    num_points: int = 1024,
    categories: list[str] | None = None,
    rng: np.random.Generator | None = None,
    max_file_points: int = 2048,
) -> PoseDataset:
    """Load a dataset stored in the reference's txt-per-cloud tree
    (``<root>/<cat>/<cat>_NNNN.txt`` + ``_rot``/``_tran`` — ModelDataLoader.py
    :60-91) straight into a PoseDataset.

    Bulk parsing goes through the native thread pool
    (native/pcnative.cpp pc_load_csv_files — the stand-in for the reference's
    ``DataLoader(num_workers=10)`` host parallelism) with a numpy fallback.
    Clouds are random-sampled to ``num_points`` without replacement
    (ModelDataLoader.py:86) and the sign convention is applied
    (:88-89: ``sign = sign(rot_z)``, ``rot_z = |rot_z|``).
    """
    import glob as _glob

    from pointnet_like_pose_estimation_tpu.pipeline import native_dbscan

    categories = categories or CATEGORIES
    rng = rng or np.random.default_rng(0)
    pt_paths, rot_paths, tran_paths, labels = [], [], [], []
    for ci, cat in enumerate(categories):
        stems = sorted(
            p[: -len(".txt")]
            for p in _glob.glob(os.path.join(root, cat, f"{cat}_*.txt"))
            if not p.endswith(("_rot.txt", "_tran.txt"))
        )
        n_train = _split_count(len(stems))
        keep = stems[:n_train] if split == "train" else stems[n_train:]
        pt_paths += [s + ".txt" for s in keep]
        rot_paths += [s + "_rot.txt" for s in keep]
        tran_paths += [s + "_tran.txt" for s in keep]
        labels += [ci] * len(keep)
    if not pt_paths:
        raise FileNotFoundError(f"no reference-layout samples under {root}")

    def _bulk(paths: list[str], max_rows: int, cols: int):
        native = native_dbscan.load_csv_files(paths, max_rows, cols)
        if native is not None:
            vals, rows = native
            if (rows < 0).any():
                bad = [p for p, r in zip(paths, rows) if r < 0]
                raise FileNotFoundError(f"unreadable sample files: {bad[:3]}...")
            return vals, rows
        vals = np.zeros((len(paths), max_rows, cols), np.float32)
        rows = np.zeros((len(paths),), np.int32)
        for i, p in enumerate(paths):
            a = np.loadtxt(p, delimiter=",", dtype=np.float32).reshape(-1, cols)
            rows[i] = min(len(a), max_rows)
            vals[i, : rows[i]] = a[: rows[i]]
        return vals, rows

    raw, counts = _bulk(pt_paths, max_file_points, 3)
    rot = _bulk(rot_paths, 1, 3)[0][:, 0]
    tran = _bulk(tran_paths, 1, 3)[0][:, 0]
    # random-sample (without replacement) each cloud to num_points
    points = np.empty((len(raw), num_points, 3), np.float32)
    for i in range(len(raw)):
        n = int(counts[i])
        sel = (
            rng.choice(n, num_points, replace=False)
            if n >= num_points
            else rng.choice(max(n, 1), num_points, replace=True)
        )
        points[i] = raw[i, sel]
    sign = np.sign(rot[:, 2]).astype(np.float32)
    rot = rot.copy()
    rot[:, 2] = np.abs(rot[:, 2])
    return PoseDataset(
        points=points,
        labels=np.asarray(labels, np.int32),
        rot=rot,
        tran=tran,
        sign=sign,
    )


def iter_batches(
    ds: PoseDataset,
    batch_size: int,
    *,
    rng: np.random.Generator | None = None,
    drop_last: bool = True,
) -> Iterator[dict]:
    """Yield shuffled dict batches (host-side; augmentation runs jitted on
    device, see augment.py)."""
    order = np.arange(len(ds))
    if rng is not None:
        rng.shuffle(order)
    stop = len(order) - (len(order) % batch_size if drop_last else 0)
    for lo in range(0, stop, batch_size):
        sel = order[lo : lo + batch_size]
        if drop_last and len(sel) < batch_size:
            break
        yield {
            "points": ds.points[sel],
            "labels": ds.labels[sel],
            "rot": ds.rot[sel],
            "tran": ds.tran[sel],
            "sign": ds.sign[sel],
            "width": ds.width[sel][:, None],
        }
