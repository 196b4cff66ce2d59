"""Per-stage timing + FPS reporting (C9 in SURVEY.md §2a).

Replicates the reference's instrumentation: ``process_time()`` brackets per
stage collected into a ``performance`` dict and a median-FPS printout at
stream end (midas_mediapipe.py:30, 52-60, 118-122) — plus wall-clock
percentiles (p50/p90 frame latency), which the driver's north-star metric
needs (BASELINE.md).
"""

from __future__ import annotations

import contextlib
import time
from statistics import median
from typing import Dict, List


class StageTimer:
    def __init__(self, stages=("iris", "body", "depth")):
        self.performance: Dict[str, List[float]] = {s: [] for s in stages}
        self.wall: Dict[str, List[float]] = {s: [] for s in stages}

    @contextlib.contextmanager
    def stage(self, name: str):
        if name not in self.performance:
            self.performance[name] = []
            self.wall[name] = []
        c0 = time.process_time()
        w0 = time.perf_counter()
        try:
            yield
        finally:
            self.performance[name].append(time.process_time() - c0)
            self.wall[name].append(time.perf_counter() - w0)

    def fps(self, name: str) -> float:
        """``1 // median(stage_times)`` — the reference's formula
        (midas_mediapipe.py:120-122)."""
        times = self.performance[name]
        if not times or median(times) == 0:
            return float("inf")
        return 1 // median(times)

    def percentile(self, name: str, q: float) -> float:
        xs = sorted(self.wall[name])
        if not xs:
            return 0.0
        idx = min(len(xs) - 1, int(round(q * (len(xs) - 1))))
        return xs[idx]

    def report(self) -> None:
        """End-of-stream print, same shape as midas_mediapipe.py:118-122."""
        print("Performance stats in FPS:")
        for name in ("iris", "body", "depth"):
            if self.performance.get(name):
                print(f"{name.capitalize()}: {self.fps(name)}")

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.wall.items():
            if not xs:
                continue
            out[name] = {
                "frames": len(xs),
                "fps_median_wall": (1.0 / median(xs)) if median(xs) else float("inf"),
                "p50_ms": self.percentile(name, 0.5) * 1e3,
                "p90_ms": self.percentile(name, 0.9) * 1e3,
            }
        return out
