"""RGB-D to point-cloud deprojection (pure JAX pinhole model).

Replaces the reference's Open3D RGBD path (point_collect/realsense.py:82-94)
and librealsense per-pixel loop (point_collect/camera.py:94-106) with one
vectorized elementwise computation — trivially jittable/vmappable on device.

Camera config format matches the reference's camera.json
(/root/reference/camera.json; realsense.py:28-54): width/height/fps plus
depth_/color_ fx, fy, ppx, ppy; the same code-default fallback values are
used when no file is given.
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Pinhole intrinsics (defaults: reference camera.json / D4xx 640x480)."""

    width: int = 640
    height: int = 480
    fps: int = 30
    fx: float = 384.9848022460938
    fy: float = 384.9848022460938
    ppx: float = 317.2736206054688
    ppy: float = 241.2351684570312
    depth_scale: float = 0.001  # realsense units: mm -> m

    @classmethod
    def from_json(cls, path: str, stream: str = "depth") -> "CameraIntrinsics":
        with open(path) as f:
            d = json.load(f)
        return cls(
            width=d["width"],
            height=d["height"],
            fps=d.get("fps", 30),
            fx=d[f"{stream}_fx"],
            fy=d[f"{stream}_fy"],
            ppx=d[f"{stream}_ppx"],
            ppy=d[f"{stream}_ppy"],
        )


def deproject_depth(depth, intr: CameraIntrinsics, color=None, *, flip_yz: bool = True):
    """Depth image -> point cloud.

    Args:
      depth: [H, W] depth (raw units; multiplied by ``depth_scale``).
      intr: camera intrinsics.
      color: optional [H, W, 3] in [0, 1]; appended as channels 3:6
        (realsense.py:88-89 xyzrgb layout).
      flip_yz: negate y and z like the reference (realsense.py:90).

    Returns:
      [H*W, 3] or [H*W, 6] float32 points (zero-depth pixels map to the
      origin; filter with a distance cut downstream).
    """
    H, W = depth.shape
    z = depth.astype(jnp.float32) * intr.depth_scale
    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    x = (u - intr.ppx) / intr.fx * z
    y = (v - intr.ppy) / intr.fy * z
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    if flip_yz:
        pts = pts * jnp.asarray([1.0, -1.0, -1.0])
    if color is not None:
        pts = jnp.concatenate([pts, color.reshape(-1, 3).astype(jnp.float32)], axis=-1)
    return pts
