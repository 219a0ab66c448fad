"""Tracing / profiling (SURVEY.md §5 "Tracing / profiling").

The reference's observability is per-request ``latency_ms`` +
``queue_stats`` fields (reference ``daemon/server.py:489,603,797``), which
the serving layer here keeps bit-compatible. The TPU equivalent adds what
the reference lacks:

- :class:`StageTimer` — wall-clock per-stage breakdown (mel/encode/decode/
  align) usable inside host orchestration loops;
- :func:`device_trace` — ``jax.profiler`` trace context writing TensorBoard
  profiles (op-level timeline on real TPU);
- :func:`annotate` — ``jax.profiler.TraceAnnotation`` for named host spans
  that show up inside device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Iterator


class StageTimer:
    """Accumulates wall-clock per named stage; reentrant-safe via with()."""

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, Any]:
        return {
            name: {
                "total_ms": round(self.totals[name] * 1000, 2),
                "count": self.counts[name],
                "mean_ms": round(self.totals[name] / max(self.counts[name], 1) * 1000, 2),
            }
            for name in sorted(self.totals)
        }


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in device traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
