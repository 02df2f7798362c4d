"""Per-context timers (reference: Blasted_data time fields,
include/blasted_petsc.h:56-84 — factorwalltime/applywalltime/cputime and
call counters, summed over a context list by computeTotalTimes,
blasted_petsc.cpp:723-735)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class PrecTimers:
    factor_walltime: float = 0.0
    factor_cputime: float = 0.0
    apply_walltime: float = 0.0
    apply_cputime: float = 0.0
    factor_calls: int = 0
    apply_calls: int = 0

    def time_factor(self):
        return _Span(self, "factor")

    def time_apply(self):
        return _Span(self, "apply")


class _Span:
    def __init__(self, t: PrecTimers, kind: str):
        self.t = t
        self.kind = kind

    def __enter__(self):
        self.w0 = time.perf_counter()
        self.c0 = time.process_time()
        return self

    def __exit__(self, *exc):
        w = time.perf_counter() - self.w0
        c = time.process_time() - self.c0
        if self.kind == "factor":
            self.t.factor_walltime += w
            self.t.factor_cputime += c
            self.t.factor_calls += 1
        else:
            self.t.apply_walltime += w
            self.t.apply_cputime += c
            self.t.apply_calls += 1
        return False


def total_times(contexts) -> PrecTimers:
    """Sum timers over a list of contexts (reference: computeTotalTimes)."""
    tot = PrecTimers()
    for c in contexts:
        t = c.timers if hasattr(c, "timers") else c
        tot.factor_walltime += t.factor_walltime
        tot.factor_cputime += t.factor_cputime
        tot.apply_walltime += t.apply_walltime
        tot.apply_cputime += t.apply_cputime
        tot.factor_calls += t.factor_calls
        tot.apply_calls += t.apply_calls
    return tot
