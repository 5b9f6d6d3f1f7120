"""Camera adapters: optional RealSense capture + file replay.

The reference drives an Intel RealSense D4xx through pyrealsense2
(point_collect/realsense.py:8-110): open stream from camera.json config,
align depth to color, persist intrinsics on close. TPU hosts have no camera,
so the capture side is a thin optional adapter — ``RealSenseCamera`` imports
pyrealsense2 lazily and raises a clear error when absent — and the replay
path (data.io_utils.ReplayCamera) plus ``deproject_depth`` serve saved
frames everywhere else, mirroring the reference's own fixture strategy
(camera_test/night_stand.txt, saved camera.json intrinsics).
"""

from __future__ import annotations

import json
import os

import numpy as np

from pointnet_like_pose_estimation_tpu.pipeline.deproject import (
    CameraIntrinsics,
    deproject_depth,
)


class RealSenseCamera:
    """Live RealSense capture (requires pyrealsense2; realsense.py parity)."""

    def __init__(self, config_path: str = "camera.json"):
        try:
            import pyrealsense2 as rs  # noqa: F401
        except ImportError as e:  # pragma: no cover - no camera on TPU hosts
            raise RuntimeError(
                "pyrealsense2 is not installed; use data.io_utils.ReplayCamera "
                "with saved .ply/.txt frames instead"
            ) from e
        self._rs = rs
        self.intr = (
            CameraIntrinsics.from_json(config_path)
            if os.path.exists(config_path)
            else CameraIntrinsics()
        )
        self.config_path = config_path
        self._pipeline = None

    def start(self):  # pragma: no cover - hardware path
        rs = self._rs
        self._pipeline = rs.pipeline()
        cfg = rs.config()
        cfg.enable_stream(
            rs.stream.depth, self.intr.width, self.intr.height, rs.format.z16, self.intr.fps
        )
        cfg.enable_stream(
            rs.stream.color, self.intr.width, self.intr.height, rs.format.bgr8, self.intr.fps
        )
        profile = self._pipeline.start(cfg)
        d = profile.get_stream(rs.stream.depth).as_video_stream_profile().get_intrinsics()
        self.intr = CameraIntrinsics(
            width=d.width, height=d.height, fps=self.intr.fps,
            fx=d.fx, fy=d.fy, ppx=d.ppx, ppy=d.ppy,
        )
        self._align = rs.align(rs.stream.color)

    def get_cloud(self) -> np.ndarray | None:  # pragma: no cover - hardware path
        frames = self._align.process(self._pipeline.wait_for_frames())
        depth = frames.get_depth_frame()
        color = frames.get_color_frame()
        if not depth or not color:
            return None
        d = np.asanyarray(depth.get_data())
        c = np.asanyarray(color.get_data())[..., ::-1] / 255.0  # bgr -> rgb
        return np.asarray(deproject_depth(d, self.intr, c))

    def close(self):  # pragma: no cover - hardware path
        if self._pipeline is not None:
            self._pipeline.stop()
        # persist intrinsics like realsense.py:44-54
        with open(self.config_path, "w") as f:
            json.dump(
                {
                    "width": self.intr.width,
                    "height": self.intr.height,
                    "fps": self.intr.fps,
                    "depth_ppx": self.intr.ppx,
                    "depth_ppy": self.intr.ppy,
                    "depth_fx": self.intr.fx,
                    "depth_fy": self.intr.fy,
                    "color_ppx": self.intr.ppx,
                    "color_ppy": self.intr.ppy,
                    "color_fx": self.intr.fx,
                    "color_fy": self.intr.fy,
                },
                f,
                indent=4,
            )
