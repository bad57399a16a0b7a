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


def device_step_seconds(trace_dir: str) -> list:
    """Parse a ``jax.profiler`` Chrome-trace export and return the DEVICE
    duration (seconds) of each profiled step (the TPU 'Steps' track).

    This is the tamper-proof timing source on the pooled/tunneled chip:
    wall-clock chained-step timing measured physically impossible throughput
    there (r2 profile found ~100 ms/step of device-busy time where the wall
    clock claimed ~11 ms — the relay reports completions early even for
    donated chains; BASELINE.md r2 notes), while the trace records what the
    hardware actually executed.
    """
    import glob
    import gzip
    import json

    traces = sorted(
        glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    )
    if not traces:
        return []
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)
    pid_names, tid_names = {}, {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev.get("args", {}).get("name", "")
    device_pids = {
        p for p, n in pid_names.items() if "TPU" in n or "device" in n.lower()
    }

    def track(name):
        return [
            ev
            for ev in trace.get("traceEvents", [])
            if ev.get("ph") == "X"
            and ev.get("pid") in device_pids
            and tid_names.get((ev["pid"], ev["tid"])) == name
            and ev.get("dur")
        ]

    steps = [float(ev["dur"]) / 1e6 for ev in track("Steps")]
    if steps:
        return steps
    # inference-only traces have no 'Steps' markers; fall back to the
    # 'XLA Modules' track (one span per executable run) restricted to the
    # dominant module so auxiliary jits don't pollute the timing
    mods = track("XLA Modules")
    if not mods:
        return []
    from collections import defaultdict

    total = defaultdict(float)
    for ev in mods:
        total[ev.get("name", "?")] += float(ev["dur"])
    main = max(total, key=total.get)
    return [float(ev["dur"]) / 1e6 for ev in mods if ev.get("name") == main]
