"""Profiling / tracing helpers (the reference has none, SURVEY.md §5).

Thin wrappers around jax.profiler so pipelines can be traced on TPU:

    with trace("/tmp/trace"):
        snp_autoSVD(pack)

plus a simple wall-time stage timer used by long pipelines.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates per-stage wall times; results in .times (dict)."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k}: {v:.2f}s ({100*v/total:.0f}%)"
                 for k, v in sorted(self.times.items(), key=lambda x: -x[1])]
        return "\n".join(lines)
