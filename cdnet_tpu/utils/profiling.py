"""Structured timing + TPU trace capture.

The reference only has ad-hoc `time.time()` deltas gated by globals
(SURVEY.md §5, `train.py:49-52,340-346`). Replacement: a `Timer` registry
with named phases (context manager / decorator) and a `trace` context that
captures a jax.profiler trace viewable in TensorBoard/Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Timer:
    """Named-phase wall-clock accumulator (host-side; device work should be
    block_until_ready'd by the caller when exact timings matter)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in sorted(self.totals)
        }

    def report(self) -> str:
        lines = []
        for k, v in self.summary().items():
            lines.append(f"{k:30s} total {v['total_s']:8.3f}s  "
                         f"n={v['count']:5d}  mean {v['mean_s'] * 1e3:8.2f}ms")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (open in TensorBoard or perfetto)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (maps to a TraceAnnotation)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
