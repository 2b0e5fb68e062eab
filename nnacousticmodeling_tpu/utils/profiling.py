"""Tracing / profiling utilities.

The reference's only instrumentation is wall-clock prints from a header
missing from its own tree (main.cpp:5) and Chainer's elapsed_time
column; here profiling is first-class:

* ``trace(dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace;
* ``Stopwatch`` — named wall-clock sections with a report, used by the
  bench harness.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Stopwatch:
    """Accumulating named timers: ``with sw("decode"): ...``."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"{name}: {self.totals[name]:.3f}s "
                         f"({self.counts[name]}x)")
        return "\n".join(lines)
