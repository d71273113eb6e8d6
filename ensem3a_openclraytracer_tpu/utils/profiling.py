"""Tracing / metrics: per-stage timers, rays/s accounting, XLA profiles.

The reference's observability is two wall-clock prints (main.py:107-111,
FileManager.py:243-247; SURVEY.md section 5).  This module provides the
framework-grade version: structured stage timers with device
synchronization, Mrays/s derived from the estimator's ray accounting
(BASELINE.md), and an optional ``jax.profiler`` trace context for
TensorBoard/XProf dumps.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax


def rays_per_render(res: int, spp: int, max_bounce: int, sun_enabled: bool) -> int:
    """Ray-segment count per render, matching the reference's accounting
    (1 cached primary + up to max_bounce+1 bounce segments per sample,
    + 1 sun shadow segment per bounce when the sun is on -
    Raytracing.cl:82, :124, :184)."""
    per_sample = (max_bounce + 1) * (2 if sun_enabled else 1)
    return res * res * (1 + spp * per_sample)


@dataclass
class StageTimer:
    """Accumulating named wall-clock timers with device sync.

    >>> timer = StageTimer()
    >>> with timer.stage("trace"):
    ...     out = fn(x)
    >>> timer.summary()
    """

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {"total_s": round(v, 4), "calls": self.counts[k],
                "mean_ms": round(1000.0 * v / self.counts[k], 3)}
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def xla_trace(log_dir: Optional[str]):
    """``jax.profiler`` trace context; no-op when ``log_dir`` is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class RenderMetrics:
    """One render's throughput record (the bench.py schema)."""

    wall_s: float
    res: int
    spp: int
    max_bounce: int
    sun_enabled: bool

    @property
    def mrays_per_s(self) -> float:
        return rays_per_render(self.res, self.spp, self.max_bounce, self.sun_enabled) / self.wall_s / 1e6

    def json_line(self, metric: str = "forward_mrays_per_s", vs_baseline: Optional[float] = None) -> str:
        return json.dumps(
            {
                "metric": metric,
                "value": round(self.mrays_per_s, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(vs_baseline, 3) if vs_baseline else 1.0,
            }
        )
