"""Wall-clock and per-stage timing.

``StopWatch`` matches the reference's monotonic millisecond timer
(``/root/reference/src/vkmr/StopWatch.cpp:27-57``).  ``StageTimes``
aggregates per-operation device timings, the role the Vulkan query-pool
timestamps play in the reference (``QueryPoolTimers.cpp:72-93``) — on TPU the
device work is timed by bracketing ``block_until_ready`` calls and, for deep
dives, ``jax.profiler`` traces.
"""

from __future__ import annotations

import time
from collections import defaultdict
from dataclasses import dataclass, field


class StopWatch:
    """Monotonic stopwatch reporting elapsed milliseconds as a float."""

    def __init__(self) -> None:
        self._started = time.perf_counter()

    def Start(self) -> None:
        self._started = time.perf_counter()

    def Elapsed(self) -> float:
        return (time.perf_counter() - self._started) * 1000.0


@dataclass
class StageTimes:
    """Accumulates per-stage {count, total_ms, total_bytes} records.

    ``throughput=True`` marks a record as a genuine rate measurement (the
    bracketed interval covers the actual work, e.g. host packing or a
    device-synchronized sample); only those stages report ``GB_per_s``.
    Dispatch brackets around async device calls measure host dispatch
    latency — real and useful, but NOT device throughput — so they carry
    bytes without a rate (this distinction is the round-1 'Stats semantics
    are misleading' fix)."""

    stages: dict = field(default_factory=lambda: defaultdict(lambda: [0, 0.0, 0, False]))

    def add(self, stage: str, ms: float, nbytes: int = 0, throughput: bool = False) -> None:
        rec = self.stages[stage]
        rec[0] += 1
        rec[1] += ms
        rec[2] += nbytes
        rec[3] = rec[3] or throughput

    def summary(self) -> dict:
        out = {}
        for name, (count, ms, nbytes, rate) in self.stages.items():
            entry = {"count": count, "ms": round(ms, 3)}
            if nbytes:
                entry["bytes"] = nbytes
                if rate and ms > 0:
                    entry["GB_per_s"] = round(nbytes / (ms * 1e6), 3)
            out[name] = entry
        return out
