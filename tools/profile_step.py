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
    args = ap.parse_args()

    from object_detection_destr_tpu.config import DestrConfig, TrainConfig
    from object_detection_destr_tpu.models.destr.model import build_destr
    from object_detection_destr_tpu.train.state import create_destr_state
    from object_detection_destr_tpu.train.steps import make_destr_train_step

    config = DestrConfig(compute_dtype="bfloat16", use_flash_attention=args.flash)
    train_cfg = TrainConfig(batch_size=args.batch, image_size=args.image)
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

    # device track pids (TPU/device names in process metadata)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if any(k in name.lower() for k in ("tpu", "device", "axon", "xla"))
        and "host" not in name.lower()
    }

    durations = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))  # microseconds
        durations[name] += dur
        counts[name] += 1
        total += dur

    print(f"pids seen: { {pid_names.get(p, p) for p in device_pids} }")
    print(f"total device op time: {total / 1e3:.2f} ms over {args.steps} steps")
    print(f"{'op':<70} {'ms':>9} {'%':>6} {'count':>6}")
    for name, dur in sorted(durations.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{name[:70]:<70} {dur / 1e3:>9.2f} {100 * dur / max(total, 1e-9):>6.2f} {counts[name]:>6}")


if __name__ == "__main__":
    main()
