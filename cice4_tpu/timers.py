"""Hierarchical named wall-clock timers.

Equivalent of ``mpi/ice_timers.F90:36-79`` (the 14 standard timers:
Total, Step, Dynamics, Advection, Column, Thermo, Shortwave, Ridging,
CatConv, Coupling, ReadWrite, Diags, History, Bound) with the same
printed report at finalize.  Device work is asynchronous under JAX, so
phase timers bracket `block_until_ready` where a true wall time is
needed; for intra-step phase attribution use `jax.profiler.trace`.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Timers:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._start = time.time()

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["Timing information:"]
        total = time.time() - self._start
        lines.append(f"  {'Total':12s} {total:12.3f} s")
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"  {name:12s} {t:12.3f} s   ({self.counts[name]}x)")
        return "\n".join(lines)
