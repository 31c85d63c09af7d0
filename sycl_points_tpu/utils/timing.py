"""Per-stage timing utilities.

Replaces ``utils/time_utils.hpp:38-57`` (measure_execution stopwatch) and the
per-stage timing maps of the reference pipelines
(``pipeline/lidar_odometry.hpp:351-383``).
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Callable, Dict

import jax


def measure_execution(func: Callable, block: bool = True):
    """Run ``func`` and return (result, elapsed_us).  When ``block`` the
    result is block_until_ready'd so device time is included."""
    t0 = time.perf_counter()
    result = func()
    if block:
        try:
            result = jax.block_until_ready(result)
        except Exception:
            pass
    return result, (time.perf_counter() - t0) * 1e6


class StageTimer:
    """Accumulating per-stage wall-clock table (the '1. preprocessing' ...
    '4. build submap' map of the reference pipelines)."""

    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    def measure(self, name: str, func: Callable):
        result, us = measure_execution(func)
        self.total[name] += us
        self.count[name] += 1
        return result

    def add(self, name: str, seconds: float):
        self.total[name] += seconds * 1e6
        self.count[name] += 1

    def averages_us(self) -> Dict[str, float]:
        return {k: self.total[k] / max(self.count[k], 1) for k in sorted(self.total)}

    def report(self) -> str:
        lines = []
        total = 0.0
        for name, avg in self.averages_us().items():
            lines.append(f"{name + ':':>28s} {avg:9.2f} us")
            total += avg
        lines.append(f"{'TOTAL:':>28s} {total:9.2f} us")
        return "\n".join(lines)
