"""Tracing / profiling utilities (SURVEY.md §5).

The reference instruments with manual ``std::chrono`` wall clocks around
each stage (``stereonet_node.cpp:805-810``, ``preprocess.cpp:989-996``).
Here: (a) a ``stage_timer`` that accumulates per-stage host timings into a
structured dict, and (b) a ``device_trace`` context manager wrapping
``jax.profiler`` for TensorBoard-viewable device traces (the ``--profile``
flag on CLI commands).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulating per-stage wall-clock timer."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_ms": round(self.totals[name] * 1e3, 3),
                "mean_ms": round(self.totals[name] / max(self.counts[name], 1) * 1e3, 3),
                "count": self.counts[name],
            }
            for name in self.totals
        }


@contextlib.contextmanager
def device_trace(logdir: Optional[str]) -> Iterator[None]:
    """Wrap a block in a jax.profiler trace when ``logdir`` is set; no-op
    otherwise.  View with TensorBoard's profile plugin."""
    if not logdir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        # Some remote-execution backends don't support device tracing;
        # degrade to a no-op rather than failing the run.
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
