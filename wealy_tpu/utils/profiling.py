"""Tracing / profiling utilities (SURVEY.md §5.1 — absent in the reference).

- :func:`trace_span`: ``jax.profiler`` annotation context for extraction /
  train / eval loop phases; no-op unless a trace is being captured.
- :func:`start_trace` / :func:`stop_trace`: capture a TensorBoard-loadable
  device trace for a window of steps.
- :class:`ThroughputMeter`: steps/sec and 30s-clips/sec/chip counters (the
  BASELINE metric unit).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace_span(name: str):
    """Named span visible in captured device traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_trace(log_dir: str) -> None:
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


class ThroughputMeter:
    """Windowed throughput: call ``tick(n_items)`` once per step."""

    def __init__(self, window: int = 50, n_chips: Optional[int] = None):
        self.window = window
        self.n_chips = n_chips or jax.device_count()
        self._stamps: list[tuple[float, int]] = []
        self.total_items = 0
        self.total_steps = 0

    def tick(self, n_items: int = 1) -> None:
        now = time.perf_counter()
        self._stamps.append((now, n_items))
        if len(self._stamps) > self.window:
            self._stamps.pop(0)
        self.total_items += n_items
        self.total_steps += 1

    @property
    def steps_per_sec(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        dt = self._stamps[-1][0] - self._stamps[0][0]
        return (len(self._stamps) - 1) / dt if dt > 0 else 0.0

    @property
    def items_per_sec(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        dt = self._stamps[-1][0] - self._stamps[0][0]
        items = sum(n for _, n in self._stamps[1:])
        return items / dt if dt > 0 else 0.0

    @property
    def items_per_sec_per_chip(self) -> float:
        return self.items_per_sec / max(1, self.n_chips)

    def report(self) -> dict:
        return {
            "steps_per_sec": round(self.steps_per_sec, 3),
            "items_per_sec": round(self.items_per_sec, 2),
            "items_per_sec_per_chip": round(self.items_per_sec_per_chip, 2),
            "total_steps": self.total_steps,
            "total_items": self.total_items,
        }
