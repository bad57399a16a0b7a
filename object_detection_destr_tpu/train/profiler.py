"""Profiling hooks.

The reference's only instrumentation is ``time.time()`` around the epoch
loop (train.py:158, 221 — SURVEY.md §5). Here:

* :class:`StepTimer` — wall-clock per-step timing with ``block_until_ready``
  on a sentinel (so the async dispatch queue is actually drained), reporting
  steps/sec and images/sec;
* :func:`trace_steps` — a ``jax.profiler`` trace window around a step range,
  viewable in TensorBoard / Perfetto, enabled by ``--profile_dir``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["StepTimer", "trace_steps"]


class StepTimer:
    """Accumulates step wall-times between explicit sync points."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.reset()

    def reset(self) -> None:
        self._t0: Optional[float] = None
        self._steps = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self) -> None:
        self._steps += 1

    def stop(self, sentinel) -> dict:
        """Block on ``sentinel`` (any jax array from the last step), then
        report {steps_per_sec, images_per_sec, seconds}."""
        jax.block_until_ready(sentinel)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        steps = max(self._steps, 1)
        return {
            "seconds": dt,
            "steps_per_sec": steps / dt,
            "images_per_sec": steps * self.batch_size / dt,
        }


@contextlib.contextmanager
def trace_steps(profile_dir: Optional[str]) -> Iterator[None]:
    """``with trace_steps(dir):`` profiles the enclosed device work."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
