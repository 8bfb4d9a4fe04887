"""Tracing and per-stage timing.

The reference's only profiling is dead `timeit.time()` assignments
(orderParam_lib.py:191, :272, :1871, :1879 — results never used). Here:
a real `jax.profiler` trace context plus a lightweight stage timer that
reports frames/sec, the framework's headline metric.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock per-stage timing with frames/sec reporting."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def report(self, n_frames: int | None = None) -> str:
        lines = []
        for name, secs in sorted(self.stages.items(), key=lambda kv: -kv[1]):
            row = f"{name:<24s} {secs * 1e3:10.2f} ms"
            if n_frames:
                row += f"  ({n_frames / secs:10.1f} frames/s)"
            lines.append(row)
        return "\n".join(lines)
