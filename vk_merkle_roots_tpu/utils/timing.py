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
    """Accumulates per-stage {count, total_ms, total_bytes} records."""

    stages: dict = field(default_factory=lambda: defaultdict(lambda: [0, 0.0, 0]))

    def add(self, stage: str, ms: float, nbytes: int = 0) -> None:
        rec = self.stages[stage]
        rec[0] += 1
        rec[1] += ms
        rec[2] += nbytes

    def summary(self) -> dict:
        out = {}
        for name, (count, ms, nbytes) in self.stages.items():
            entry = {"count": count, "ms": round(ms, 3)}
            if nbytes:
                entry["bytes"] = nbytes
                if ms > 0:
                    entry["GB_per_s"] = round(nbytes / (ms * 1e6), 3)
            out[name] = entry
        return out
