"""File IO: reference-compatible txt layout, PLY read/write, fixture replay.

The reference persists clouds as CSV txt triplets
``<cat>/<cat>_NNNN.txt`` + ``_rot.txt`` + ``_tran.txt``
(data_build/Cube.py:90-100, read back by ModelDataLoader.py:60-91) and
captures as .ply via Open3D (realsense.py:105-110,
colledt_data_structure/collect.py:119-122). This module reimplements both
without Open3D so datasets and captures interchange with the reference
on-disk formats, plus a replay "camera" that serves saved frames where no
RealSense exists (TPU hosts; SURVEY §4 fixture strategy).
"""

from __future__ import annotations

import os

import numpy as np


def save_reference_layout(root: str, category: str, index: int, points, rot, tran):
    """Write one sample in the reference txt layout (Cube.savePoints)."""
    d = os.path.join(root, category)
    os.makedirs(d, exist_ok=True)
    stem = os.path.join(d, f"{category}_{index:04d}")
    np.savetxt(stem + ".txt", np.asarray(points), fmt="%6f", delimiter=",")
    np.savetxt(stem + "_tran.txt", np.asarray(tran).reshape(1, 3), fmt="%6f", delimiter=",")
    np.savetxt(stem + "_rot.txt", np.asarray(rot).reshape(1, 3), fmt="%6f", delimiter=",")


def load_reference_sample(root: str, category: str, index: int):
    """Read one sample (points, rot, tran) from the reference txt layout
    (ModelDataLoader.py:80-91, without the sign split)."""
    stem = os.path.join(root, category, f"{category}_{index:04d}")
    points = np.loadtxt(stem + ".txt", delimiter=",")
    rot = np.loadtxt(stem + "_rot.txt", delimiter=",")
    tran = np.loadtxt(stem + "_tran.txt", delimiter=",")
    return points, rot, tran


def save_ply(path: str, points: np.ndarray):
    """ASCII PLY writer: xyz (+ rgb when 6 channels, colors in [0,1])."""
    pts = np.asarray(points)
    has_color = pts.shape[1] >= 6
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_color:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p in pts:
            row = f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}"
            if has_color:
                rgb = (np.clip(p[3:6], 0, 1) * 255).astype(int)
                row += f" {rgb[0]} {rgb[1]} {rgb[2]}"
            f.write(row + "\n")


def load_ply(path: str) -> np.ndarray:
    """ASCII/binary-LE PLY reader for xyz (+rgb) vertex clouds."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = 0
        fmt = "ascii"
        props = []
        in_vertex = False
        for line in header:
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                in_vertex = line.startswith("element vertex")
                if in_vertex:
                    n = int(line.split()[-1])
            elif line.startswith("property") and in_vertex:
                props.append(tuple(line.split()[1:]))
        names = [p[-1] for p in props]
        if fmt == "ascii":
            data = np.loadtxt(
                [f.readline().decode("ascii") for _ in range(n)], dtype=np.float64
            ).reshape(n, len(props))
        else:
            np_types = {"float": "<f4", "double": "<f8", "uchar": "u1", "int": "<i4"}
            dt = np.dtype([(p[-1], np_types[p[0]]) for p in props])
            raw = np.frombuffer(f.read(dt.itemsize * n), dtype=dt)
            data = np.column_stack([raw[name].astype(np.float64) for name in names])
    cols = [names.index(c) for c in ("x", "y", "z")]
    out = data[:, cols]
    if {"red", "green", "blue"} <= set(names):
        rgb = data[:, [names.index(c) for c in ("red", "green", "blue")]] / 255.0
        out = np.column_stack([out, rgb])
    return out


class ReplayCamera:
    """File-replay stand-in for the RealSense stream (realsense.py:56-80).

    Serves frames from saved .ply / .txt clouds — the hardware-free fixture
    path the reference used manually (camera_test/night_stand.txt etc.).
    """

    def __init__(self, paths: list[str]):
        self.paths = list(paths)
        self._i = 0

    def get_cloud(self) -> np.ndarray | None:
        if self._i >= len(self.paths):
            return None
        path = self.paths[self._i]
        self._i += 1
        if path.endswith(".ply"):
            return load_ply(path)
        return np.loadtxt(path, delimiter=",") if "," in open(path).readline() else np.loadtxt(path)

    def __iter__(self):
        while True:
            cloud = self.get_cloud()
            if cloud is None:
                return
            yield cloud
