"""Utilities: profiling, logging, compile-cache setup."""

from pointnet_like_pose_estimation_tpu.utils.profiling import (
    StepTimer,
    enable_compile_cache,
    respect_platform_env,
    sustained_step_time,
    sustained_time,
    trace,
)

__all__ = [
    "StepTimer",
    "enable_compile_cache",
    "respect_platform_env",
    "sustained_step_time",
    "sustained_time",
    "trace",
]
