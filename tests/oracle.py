"""Numpy oracle transcribing the reference op semantics for golden tests.

Each function is a direct, loop-level transcription of the math in
/root/reference/model/pointnet2_utils.py (cited per function) — written in
plain numpy so the JAX/Pallas implementations can be checked bit-for-bit
against an independent implementation.
"""

import numpy as np


def square_distance(src, dst):
    # pointnet2_utils.py:5-26 semantics, O(N*M) direct form.
    B, N, _ = src.shape
    _, M, _ = dst.shape
    out = np.empty((B, N, M), dtype=np.float64)
    for b in range(B):
        diff = src[b][:, None, :] - dst[b][None, :, :]
        out[b] = np.sum(diff * diff, axis=-1)
    return out


def farthest_point_sample(points, number, start):
    # pointnet2_utils.py:47-68 with explicit start index.
    B, N, C = points.shape
    idx = np.zeros((B, number), dtype=np.int64)
    for b in range(B):
        distance = np.full(N, 1e10)
        farthest = int(start[b]) if np.ndim(start) else int(start)
        for i in range(number):
            idx[b, i] = farthest
            centroid = points[b, farthest]
            d = np.sum((points[b] - centroid) ** 2, axis=-1)
            distance = np.minimum(distance, d)
            farthest = int(np.argmax(distance))
    return idx


def query_ball_point(radius, number, points, new_points):
    # pointnet2_utils.py:70-90: sentinel + sort + pad-with-first.
    B, N, _ = points.shape
    _, S, _ = new_points.shape
    group_idx = np.tile(np.arange(N, dtype=np.int64)[None, None, :], (B, S, 1))
    sqrdists = square_distance(new_points, points)
    group_idx[sqrdists > radius**2] = N
    group_idx = np.sort(group_idx, axis=-1)[:, :, :number]
    group_first = np.repeat(group_idx[:, :, :1], number, axis=-1)
    mask = group_idx == N
    group_idx[mask] = group_first[mask]
    # degenerate fully-empty ball: the reference would emit N and crash on
    # the gather; all impls clamp to N-1 (ops/grouping.py)
    return np.minimum(group_idx, N - 1)


def normalization(point_cloud):
    # provider.py:5-21 per-cloud loop.
    B, N, C = point_cloud.shape
    out = np.zeros((B, N, C))
    for i in range(B):
        pc = point_cloud[i]
        centroid = np.mean(pc, axis=0)
        pc = pc - centroid
        m = np.max(np.sqrt(np.sum(pc**2, axis=1)))
        out[i] = pc / m
    return out


def euler_rotation_matrix(angle_rad):
    # provider.py:66-92 / Cube.py:59-72: R = Rx @ Ry @ Rz.
    a = angle_rad
    R_x = np.array(
        [[1, 0, 0], [0, np.cos(a[0]), -np.sin(a[0])], [0, np.sin(a[0]), np.cos(a[0])]]
    )
    R_y = np.array(
        [[np.cos(a[1]), 0, np.sin(a[1])], [0, 1, 0], [-np.sin(a[1]), 0, np.cos(a[1])]]
    )
    R_z = np.array(
        [[np.cos(a[2]), -np.sin(a[2]), 0], [np.sin(a[2]), np.cos(a[2]), 0], [0, 0, 1]]
    )
    return R_x @ R_y @ R_z
