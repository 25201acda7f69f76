"""Tracing / profiling utilities.

The reference's observability is minimal (SURVEY §5: unused wall-clock deltas
in the test loops, mmcv.ProgressBar, post-hoc log parsing).  This module is
the TPU-native upgrade:

  * `PhaseTimer` — named wall-clock phases with EMA + totals, printable
    summary (the `t_data`/`t_net` measurements the reference computes but
    never prints, tools/test.py:55-56,195-196);
  * `trace` — context manager around `jax.profiler` emitting a TensorBoard-
    loadable XPlane trace of device execution;
  * `annotate` — `jax.profiler.TraceAnnotation` for host-side phases so the
    input pipeline shows up alongside device ops in the trace viewer;
  * `device_memory_stats` — HBM occupancy snapshot.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseTimer:
    def __init__(self, ema: float = 0.98):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)
        self.avg: Dict[str, float] = {}
        self.ema = ema

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1
            prev = self.avg.get(name, dt)
            self.avg[name] = self.ema * prev + (1 - self.ema) * dt

    def summary(self) -> str:
        lines = [f"{'phase':>16} {'total_s':>9} {'calls':>7} {'avg_ms':>8}"]
        for name in sorted(self.total, key=self.total.get, reverse=True):
            n = self.count[name]
            lines.append(f"{name:>16} {self.total[name]:>9.2f} {n:>7} "
                         f"{self.total[name] / n * 1000:>8.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/hvrnet_tpu_trace"):
    """Capture a jax.profiler trace (open with TensorBoard's profile tab)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side named region visible in the profiler timeline."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> Optional[dict]:
    import jax
    d = device or jax.devices()[0]
    try:
        return d.memory_stats()
    except Exception:
        return None
