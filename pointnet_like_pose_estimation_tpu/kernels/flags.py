"""Kernel implementation selection.

Env knobs (read once at import):
  PLPE_GROUPING = auto | xla | pallas | pallas_interpret
  PLPE_FPS      = auto | xla | pallas | pallas_interpret

``auto`` resolves to the Pallas kernels on TPU backends and XLA elsewhere.
``pallas_interpret`` runs the kernels in interpreter mode (CPU testing).
"""

from __future__ import annotations

import os

import jax

_GROUPING = os.environ.get("PLPE_GROUPING", "auto")
_FPS = os.environ.get("PLPE_FPS", "auto")

_TPU_BACKENDS = ("tpu", "axon")


def _resolve(value: str) -> str:
    if value == "auto":
        return "pallas" if jax.default_backend() in _TPU_BACKENDS else "xla"
    return value


def grouping_impl() -> str:
    return _resolve(_GROUPING)


def fps_impl() -> str:
    return _resolve(_FPS)


def set_impls(grouping: str | None = None, fps: str | None = None) -> None:
    """Programmatic override (tests/benchmarks)."""
    global _GROUPING, _FPS
    if grouping is not None:
        _GROUPING = grouping
    if fps is not None:
        _FPS = fps
