"""STL mesh reading + surface sampling.

The reference ships CAD meshes for the 7 physical objects
(data_build/3d_model/*.stl) but has no code to use them — training data
comes from the analytic generators. Here meshes are first-class: a
dependency-free STL reader (binary + ASCII) and an area-weighted surface
sampler, so real CAD models can feed the same dataset/FPS path as the
analytic shapes.
"""

from __future__ import annotations

import struct

import numpy as np


def load_stl(path: str) -> np.ndarray:
    """Read an STL file -> triangles [T, 3, 3] float64."""
    with open(path, "rb") as f:
        head = f.read(5)
        f.seek(0)
        if head == b"solid":
            # could still be binary with a 'solid' header; try ascii, fall back
            try:
                return _load_ascii(path)
            except Exception:
                pass
        return _load_binary(f.read())


def _load_binary(data: bytes) -> np.ndarray:
    n = struct.unpack("<I", data[80:84])[0]
    tris = np.empty((n, 3, 3))
    rec = np.frombuffer(data[84 : 84 + n * 50], dtype=np.uint8).reshape(n, 50)
    floats = rec[:, :48].copy().view("<f4").reshape(n, 4, 3)
    tris[:] = floats[:, 1:4, :]  # skip the normal
    return tris


def _load_ascii(path: str) -> np.ndarray:
    verts = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts and parts[0] == "vertex":
                verts.append([float(x) for x in parts[1:4]])
    arr = np.asarray(verts)
    if len(arr) == 0 or len(arr) % 3:
        raise ValueError("not a valid ascii STL")
    return arr.reshape(-1, 3, 3)


def sample_mesh_surface(
    triangles: np.ndarray, num_points: int, rng: np.random.Generator | None = None
) -> np.ndarray:
    """Uniform area-weighted surface sampling -> [num_points, 3].

    Triangles are chosen proportionally to area; points placed by the
    standard sqrt-barycentric trick.
    """
    rng = rng or np.random.default_rng(0)
    a, b, c = triangles[:, 0], triangles[:, 1], triangles[:, 2]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1)
    total = areas.sum()
    if total <= 0:
        raise ValueError("degenerate mesh")
    probs = areas / total
    tri_idx = rng.choice(len(triangles), size=num_points, p=probs)
    r1 = np.sqrt(rng.uniform(size=(num_points, 1)))
    r2 = rng.uniform(size=(num_points, 1))
    return (
        (1 - r1) * a[tri_idx] + r1 * (1 - r2) * b[tri_idx] + r1 * r2 * c[tri_idx]
    )


def save_stl(path: str, triangles: np.ndarray) -> None:
    """Write triangles [T, 3, 3] as binary STL (normals recomputed)."""
    tris = np.asarray(triangles, np.float64)
    n = len(tris)
    normals = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    norm = np.linalg.norm(normals, axis=-1, keepdims=True)
    normals = np.where(norm > 0, normals / np.maximum(norm, 1e-30), 0.0)
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", n))
        floats = np.concatenate([normals[:, None, :], tris], axis=1).astype("<f4")
        rec = np.zeros((n, 50), np.uint8)
        rec[:, :48] = np.frombuffer(floats.tobytes(), np.uint8).reshape(n, 48)
        f.write(rec.tobytes())
