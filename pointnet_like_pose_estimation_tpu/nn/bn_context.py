"""Trace-time BatchNorm sync context (dependency-free; see parallel.context
for the public re-export alongside point_sharding).

While tracing under ``bn_sync(axis)``, every BatchNorm in the package is
constructed with ``axis_name=axis`` so flax computes CROSS-REPLICA batch
statistics (``lax.pmean``) — used by the shard_map data-parallel step so
per-shard BN matches the single-program global-batch statistics the
reference's single-GPU BN trivially had.
"""

from __future__ import annotations

import contextlib

_BN_AXIS: list[str] = []


@contextlib.contextmanager
def bn_sync(axis_name: str):
    _BN_AXIS.append(axis_name)
    try:
        yield
    finally:
        _BN_AXIS.pop()


def bn_axis_name() -> str | None:
    return _BN_AXIS[-1] if _BN_AXIS else None
