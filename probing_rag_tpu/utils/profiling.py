"""Tracing/profiling helpers (SURVEY.md §5.1 — absent in the reference).

``trace_annotation`` wraps phases (index-search, decode-step, prober-gate)
in ``jax.profiler.TraceAnnotation`` so they are attributed in TPU profiles;
``timed_phase`` gives block-until-ready wall timing for benchmark mode; and
``profile_to`` captures a full device trace directory viewable in
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace_annotation(name: str) -> Iterator[None]:
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class PhaseTimer:
    """Accumulates block-until-ready wall time per named phase."""

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, sync: Optional[object] = None) -> Iterator[None]:
        start = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        if sync is not None:
            jax.block_until_ready(sync)
        elapsed = time.perf_counter() - start
        self.totals[name] = self.totals.get(name, 0.0) + elapsed
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / self.counts[name], 4),
            }
            for name in self.totals
        }
