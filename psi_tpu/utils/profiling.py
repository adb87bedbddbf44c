"""Tracing and throughput instrumentation.

The reference has none (SURVEY.md §5: only a wall-clock checkpoint
timer). The rebuild provides:

* ``trace(logdir)`` — context manager around jax.profiler for XLA/TPU
  timeline capture viewable in TensorBoard/Perfetto;
* ``StepTimer`` — rolling step-time / items-per-second counters for
  train/generation/fitting loops;
* ``annotate`` — TraceAnnotation wrapper so framework phases show up
  named in profiles.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in the device trace (fallback no-op off-TPU)."""
    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover
        return contextlib.nullcontext()


class StepTimer:
    """Rolling throughput meter: step time and items/sec."""

    def __init__(self, window: int = 50):
        self.times: deque = deque(maxlen=window)
        self.items: deque = deque(maxlen=window)
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_items: int = 1) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self.items.append(n_items)
        return dt

    @contextlib.contextmanager
    def step(self, n_items: int = 1) -> Iterator[None]:
        self.start()
        yield
        self.stop(n_items)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"mean_step_s": 0.0, "items_per_sec": 0.0, "steps": 0}
        total_t = sum(self.times)
        return {
            "mean_step_s": total_t / len(self.times),
            "items_per_sec": sum(self.items) / total_t if total_t > 0 else 0.0,
            "steps": len(self.times),
        }
