"""Lightweight stage timing + optional XLA profiler traces.

The reference has no observability at all (SURVEY.md section 5); here
every pipeline run can report where its wall-clock went (host parse, GTR
eigen, device transfer, compile, per-chunk execution) and optionally wrap
execution in a jax.profiler trace for TensorBoard.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Dict, Optional


class StageTimer:
    """Accumulates named wall-clock spans."""

    def __init__(self):
        self.times: "OrderedDict[str, float]" = OrderedDict()
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"total {total * 1e3:.1f}ms"]
        for name, t in self.times.items():
            n = self.counts[name]
            lines.append(
                f"  {name}: {t * 1e3:.1f}ms"
                + (f" ({n}x)" if n > 1 else ""))
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.times)


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """jax.profiler trace when a directory is given, else a no-op."""
    if trace_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
