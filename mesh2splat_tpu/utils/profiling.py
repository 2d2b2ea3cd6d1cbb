"""Frame timing + observability.

The reference rotates a pool of 10 GL_TIME_ELAPSED queries read 5 frames late
to avoid pipeline stalls (reference: src/renderer/renderer.cpp:59-63,147-175)
and plots them in the UI. The JAX equivalent of "read 5 frames late" is
keeping device futures un-synced: FrameTimer holds a deque of (t_submit,
result_future) pairs and only forces completion ``latency`` frames later, so
timing never serializes the device.

For deep traces use ``trace()`` which wraps jax.profiler (view in
TensorBoard / xprof) — the RenderDoc/Nsight debug-group analogue
(reference: RenderContext.hpp:12-25 PassesDebugIDs).
"""

from __future__ import annotations

import collections
import contextlib
import time

import jax


class FrameTimer:
    """Rolling frame timer with deferred synchronization."""

    def __init__(self, pool: int = 10, latency: int = 5):
        # mirrors NUM_FRAME_TIME_QUERIES=10 / 5-frame latency (renderer.cpp:59-63)
        self.pool = pool
        self.latency = latency
        self._pending = collections.deque()
        self.samples = collections.deque(maxlen=pool)

    def frame(self, result):
        """Record a frame whose device work ends at `result` (any pytree of
        device arrays). Returns the newest *completed* frame time in ms, or
        None while the pipeline warms up."""
        self._pending.append((time.perf_counter(), result))
        if len(self._pending) > self.latency:
            t_submit, res = self._pending.popleft()
            jax.block_until_ready(res)
            self.samples.append((time.perf_counter() - t_submit) * 1e3)
        return self.samples[-1] if self.samples else None

    @property
    def average_ms(self):
        return sum(self.samples) / len(self.samples) if self.samples else None


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/m2s_trace"):
    """jax.profiler trace context (xprof): per-kernel device timelines."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler traces (the glPushDebugGroup analogue)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def format_with_commas(value: int) -> str:
    """UI count formatting (reference: utils.cpp:404-430)."""
    return f"{value:,}"
