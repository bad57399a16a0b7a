"""Profile the DESTR train step on the attached chip and print the top
device ops by total time (parses the Chrome-trace export of jax.profiler).

    python tools/profile_step.py [--steps 3] [--batch 8] [--image 640]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--image", type=int, default=640)
    ap.add_argument("--trace_dir", type=str, default="/tmp/destr_profile")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--flash", action="store_true")
    ap.add_argument("--backbone", type=str, default="resnet50")
    ap.add_argument("--dilation", action="store_true")
    ap.add_argument("--opt_layout", type=str, default="auto",
                    choices=["auto", "per-leaf", "grouped", "flat"])
    args = ap.parse_args()

    from object_detection_destr_tpu.config import DestrConfig, TrainConfig
    from object_detection_destr_tpu.models.destr.model import build_destr
    from object_detection_destr_tpu.train.state import create_destr_state
    from object_detection_destr_tpu.train.steps import make_destr_train_step

    config = DestrConfig(compute_dtype="bfloat16", use_flash_attention=args.flash,
                         backbone=args.backbone, dilation=args.dilation)
    train_cfg = TrainConfig(batch_size=args.batch, image_size=args.image,
                            opt_layout=args.opt_layout)
    model = build_destr(config)
    state, tx = create_destr_state(model, train_cfg, image_size=args.image)
    train_step = make_destr_train_step(model, tx, train_cfg)

    rng = np.random.default_rng(0)
    t = 32
    batch = {
        "images": jnp.asarray(
            rng.normal(size=(args.batch, args.image, args.image, 3)).astype(np.float32)
        ),
        "boxes": jnp.asarray(
            rng.uniform(0.2, 0.7, size=(args.batch, t, 4)).astype(np.float32)
        ),
        "labels": jnp.zeros((args.batch, t), jnp.int32),
        "valid": jnp.ones((args.batch, t), bool),
    }

    state, metrics = train_step(state, batch)  # compile
    jax.block_until_ready(metrics)

    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(os.path.join(args.trace_dir, "**", "*.trace.json.gz"),
                              recursive=True))
    if not traces:
        print("no trace written")
        return
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)

    summarize_trace(trace, args.steps, args.top)


def summarize_trace(trace, steps: int, top: int) -> None:
    """Grouped view of the device 'XLA Ops' track ONLY (no double counting
    against the Steps / XLA Modules wrappers): per-hlo_category totals, then
    the top ops with their long_name attribution."""
    pid_names, tid_names = {}, {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if any(k in name.lower() for k in ("tpu", "device", "axon"))
        and "host" not in name.lower()
    }

    step_ms = [
        float(ev["dur"]) / 1e3
        for ev in trace.get("traceEvents", [])
        if ev.get("ph") == "X" and ev.get("pid") in device_pids
        and tid_names.get((ev["pid"], ev["tid"])) == "Steps"
    ]

    cat_dur, cat_cnt = defaultdict(float), defaultdict(int)
    op_dur, op_cnt, op_long = defaultdict(float), defaultdict(int), {}
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        if tid_names.get((ev["pid"], ev["tid"])) != "XLA Ops":
            continue
        a = ev.get("args", {}) or {}
        cat = a.get("hlo_category", "?")
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))  # us
        cat_dur[cat] += dur
        cat_cnt[cat] += 1
        op_dur[name] += dur
        op_cnt[name] += 1
        if name not in op_long:
            op_long[name] = a.get("long_name", "")[
                : (4000 if os.environ.get("PROFILE_FULL_NAMES") else 90)
            ]
        total += dur

    if step_ms:
        import statistics

        print(f"step device time: median {statistics.median(step_ms):.2f} ms "
              f"over {len(step_ms)} steps")
    print(f"total XLA-op device time: {total / 1e3:.2f} ms over {steps} steps "
          f"({total / 1e3 / max(steps, 1):.2f} ms/step)")
    print(f"\n{'category':<28} {'ms/step':>9} {'%':>6} {'count/step':>10}")
    for cat, dur in sorted(cat_dur.items(), key=lambda kv: -kv[1]):
        print(f"{cat:<28} {dur / 1e3 / steps:>9.2f} "
              f"{100 * dur / max(total, 1e-9):>6.2f} {cat_cnt[cat] // steps:>10}")
    print(f"\n{'op':<40} {'ms/step':>8} {'%':>6} {'cnt':>4}  long_name")
    for name, dur in sorted(op_dur.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{name[:40]:<40} {dur / 1e3 / steps:>8.2f} "
              f"{100 * dur / max(total, 1e-9):>6.2f} {op_cnt[name] // steps:>4}  "
              f"{op_long.get(name, '')}")


if __name__ == "__main__":
    main()
