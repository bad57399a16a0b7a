"""The bench timing chain (VERDICT r2 #7): ``device_step_seconds`` on
miniature trace fixtures, and bench.py's honest labeling when the trace is
missing or the traced window fails.

Wall-clock on the pooled relay is dishonest (BASELINE.md r2), so any
fallback to it must be labeled UNRELIABLE in the emitted metric string —
one profiler-format change away from silent relay fiction otherwise.
"""

from __future__ import annotations

import gzip
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True, exist_ok=True)
    payload = {"traceEvents": events}
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump(payload, f)
    return str(tmp_path)


def _meta(pid, pname, tid=None, tname=None):
    evs = [{"ph": "M", "name": "process_name", "pid": pid,
            "args": {"name": pname}}]
    if tid is not None:
        evs.append({"ph": "M", "name": "thread_name", "pid": pid, "tid": tid,
                    "args": {"name": tname}})
    return evs


def test_steps_track_parsed(tmp_path):
    from object_detection_destr_tpu.train.profiler import device_step_seconds

    events = _meta(7, "/device:TPU:0", 3, "Steps") + [
        {"ph": "X", "pid": 7, "tid": 3, "name": f"step {i}", "dur": 50_000.0,
         "ts": i * 60_000}
        for i in range(4)
    ]
    steps = device_step_seconds(_write_trace(tmp_path, events))
    assert len(steps) == 4
    assert all(abs(s - 0.05) < 1e-9 for s in steps)


def test_xla_modules_fallback_dominant_module(tmp_path):
    """No 'Steps' markers (infer traces): falls back to the dominant
    'XLA Modules' track and ignores auxiliary jits."""
    from object_detection_destr_tpu.train.profiler import device_step_seconds

    events = _meta(7, "/device:TPU:0", 5, "XLA Modules") + [
        {"ph": "X", "pid": 7, "tid": 5, "name": "jit_fwd", "dur": 24_000.0,
         "ts": i * 30_000}
        for i in range(3)
    ] + [
        # a tiny auxiliary jit that must NOT be picked (smaller total)
        {"ph": "X", "pid": 7, "tid": 5, "name": "jit_aux", "dur": 100.0,
         "ts": 95_000},
    ]
    steps = device_step_seconds(_write_trace(tmp_path, events))
    assert len(steps) == 3
    assert all(abs(s - 0.024) < 1e-9 for s in steps)


def test_host_only_trace_returns_empty(tmp_path):
    """CPU-only traces (no TPU process) yield [] — callers must then label
    the wall-clock fallback, never silently report it as device time."""
    from object_detection_destr_tpu.train.profiler import device_step_seconds

    events = _meta(1, "python host", 2, "Steps") + [
        {"ph": "X", "pid": 1, "tid": 2, "name": "step", "dur": 1000.0, "ts": 0}
    ]
    assert device_step_seconds(_write_trace(tmp_path, events)) == []


def test_missing_trace_returns_empty(tmp_path):
    from object_detection_destr_tpu.train.profiler import device_step_seconds

    assert device_step_seconds(str(tmp_path)) == []


@pytest.fixture
def bench_module(monkeypatch):
    """Import bench.py fresh so its module globals reset between tests."""
    import importlib

    sys.modules.pop("bench", None)
    mod = importlib.import_module("bench")
    yield mod
    sys.modules.pop("bench", None)


def test_bench_labels_no_steps_as_unreliable(bench_module, monkeypatch):
    """A trace without device steps must flip the timing-method label to the
    UNRELIABLE wall-clock wording (it feeds the metric string)."""
    calls = []
    bench_module._TIMING_METHOD = "profiler device-time"
    dt = bench_module._device_time_or(1.23, lambda: calls.append(1), batch=8)
    assert dt == 1.23  # wall fallback value
    assert calls  # run_once executed under the trace
    assert "UNRELIABLE" in bench_module._TIMING_METHOD
    assert "WALL-CLOCK" in bench_module._TIMING_METHOD


def test_bench_labels_trace_failure_and_stops_profiler(bench_module):
    """run_once raising inside the traced window must (a) stop the profiler
    (so the next window can trace) and (b) label the fallback UNRELIABLE
    (ADVICE r2: the bare fallback used to keep the device-time label)."""
    import jax

    bench_module._TIMING_METHOD = "profiler device-time"

    def boom():
        raise RuntimeError("window failed")

    dt = bench_module._device_time_or(0.5, boom, batch=8)
    assert dt == 0.5
    assert "UNRELIABLE" in bench_module._TIMING_METHOD
    # profiler must not be left running: a fresh start_trace succeeds
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        jax.profiler.stop_trace()
