"""Tracing / profiling utilities.

The reference's only profiling was ad-hoc ``time.time()`` brackets in model
smoke tests (rotation.py:71-79, mutilthreading/predict_test.py:51-67 —
SURVEY §5). TPU-native equivalents: ``jax.profiler`` traces viewable in
XProf/TensorBoard, a per-step wall-clock timer that understands async
dispatch, and the persistent compilation cache (compiles over a tunneled
TPU are minutes; cached reloads are seconds).
"""

from __future__ import annotations

import contextlib
import warnings
import os
import time

import jax


def enable_compile_cache(path: str = "/tmp/jax_cache") -> None:
    """Turn on the persistent XLA compilation cache."""
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    respect_platform_env()


def respect_platform_env() -> None:
    """Honor ``JAX_PLATFORMS`` even where the image pins ``jax_platforms``
    outside the environment (the tunneled-TPU default otherwise wins, and a
    user asking for ``JAX_PLATFORMS=cpu`` would silently get the TPU)."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Profile a block with jax.profiler (open in XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def sustained_time(fn, *args, min_seconds: float = 2.0, max_iters: int = 1 << 20):
    """Seconds per call under SUSTAINED load, robust to async-dispatch
    artifacts.

    Round-4 finding: over the tunneled TPU, ``block_until_ready`` can return
    early for short dispatch queues of small programs — a 20-iteration timed
    loop of a 17 ms train step reported 1.2 ms (measured; loss trajectories
    prove the work happens, 200-step wall clock proves the true rate). Every
    sub-millisecond "XLA is capriciously fast at small batch" row in the
    round-3 microbenches was this artifact. The robust protocol: grow the
    iteration count until the timed span covers >= ``min_seconds`` of real
    wall clock AND fetch a result value to the host (``device_get``) as the
    final barrier — queue depth is bounded, so a long enough run converges
    to the true sustained rate with error <= queue_depth / iters.
    """
    def _sync(out):
        # fetch ONE element to the host as the barrier: completing the
        # slice implies the producing buffer completed, and 4 bytes over
        # the tunnel is free — device_get of the full array would add a
        # multi-second host transfer for large outputs and poison the
        # measurement
        leaf = jax.tree.leaves(out)[0]
        jax.device_get(leaf.ravel()[0] if getattr(leaf, "ndim", 0) else leaf)

    out = fn(*args)
    jax.block_until_ready(out)
    _sync(out)
    iters = 4
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        t = time.perf_counter() - t0
        if t >= min_seconds or iters >= max_iters:
            if t < min_seconds:
                warnings.warn(
                    f"sustained_time hit max_iters={max_iters} with only "
                    f"{t:.3f}s of span (< min_seconds={min_seconds}); the "
                    "result may still be dispatch-bound", stacklevel=2)
            return t / iters
        # scale straight to the target span (at least doubling)
        iters = min(max_iters, max(iters * 2, int(iters * min_seconds / max(t, 1e-9)) + 1))


def sustained_step_time(step, state, batch, *, min_seconds: float = 2.0,
                        max_iters: int = 1 << 20):
    """``sustained_time`` for DONATED train steps: ``step(state, batch) ->
    (state, metrics)`` donates its state argument, so the state must thread
    through the timed loop instead of repeating fixed args. Same protocol:
    grow the iteration count until the span covers ``min_seconds`` of wall
    clock, fetch the (scalar) loss to the host as the barrier.

    Returns ``(seconds_per_step, final_state)``.
    """
    state, m = step(state, batch)
    jax.device_get(m["loss"])
    iters = 8
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch)
        jax.device_get(m["loss"])
        t = time.perf_counter() - t0
        if t >= min_seconds or iters >= max_iters:
            if t < min_seconds:
                warnings.warn(
                    f"sustained_step_time hit max_iters={max_iters} with "
                    f"only {t:.3f}s of span (< min_seconds={min_seconds})",
                    stacklevel=2)
            return t / iters, state
        iters = min(max_iters, max(iters * 2, int(iters * min_seconds / max(t, 1e-9)) + 1))


class StepTimer:
    """Wall-clock timing of jitted steps with proper device sync.

    ``block`` is a leaf of the step output to block on; timing without
    blocking measures dispatch, not compute.
    """

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, block=None):
        if block is not None:
            jax.block_until_ready(block)
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.times else 0.0
