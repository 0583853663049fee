"""Profiling / tracing / memory observability.

Replaces the reference's torch.profiler template (scripts/profiler.py:62-113,
unrunnable there due to broken imports) and its CUDA memory prints
(model_wrappers.py:236-243):

- :func:`trace`: context manager around ``jax.profiler`` producing a
  TensorBoard/XProf trace directory.
- :func:`device_memory_stats`: per-device HBM usage.
- :class:`ThroughputMeter`: the per-epoch "Rate: datapoints/s" metric
  (model_wrappers.py:182-187) kept for parity.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "./profile-log"):
    """with trace("./profile-log"): run_steps() -> TensorBoard trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict]:
    """{device: memory stats} where the backend exposes them (TPU does)."""
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out


def format_memory_report() -> str:
    """Human-readable device memory report (the reference's per-epoch CUDA
    memory print, model_wrappers.py:236-243)."""
    lines = []
    for dev, s in device_memory_stats().items():
        gib = 1024 ** 3
        cur = (s["bytes_in_use"] or 0) / gib
        peak = (s["peak_bytes_in_use"] or 0) / gib
        lim = (s["bytes_limit"] or 0) / gib
        lines.append(f"{dev}: {cur:.2f} GiB in use (peak {peak:.2f} / {lim:.2f})")
    return "\n".join(lines) or "no device memory stats available"


class ThroughputMeter:
    """Datapoints/s per epoch (reference model_wrappers.py:182-187)."""

    def __init__(self):
        self._t0: Optional[float] = None
        self.rate = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, datapoints: int) -> float:
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.rate = datapoints / dt if dt > 0 else 0.0
        return self.rate
