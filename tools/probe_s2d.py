"""Probe: device-time of space-to-depth stem lowerings at (b, 640, 640, 3).

    python tools/probe_s2d.py [--b 8] [--hw 640]

The stem is frozen (ResNet freezing policy — backbone.py:92-99), so only
the forward lowering matters. Candidates produce bit-identical conv
outputs (kernel permuted to match each variant's channel order); the
baseline is the plain 7x7/s2 conv the reference runs.

Measured r3 (v5e, b8/640, bf16, device-time over 5):
  reshape-transpose (current SpaceToDepthStem): see BASELINE.md
  patches-conv / slice-concat / 7x7 / 8x8: printed side by side.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def _w2_from(kernel: jnp.ndarray, order: str = "pqc") -> jnp.ndarray:
    """(7,7,3,64) -> (4,4,12,64) packed kernel; `order` sets the 12-channel
    element order to match the s2d tensor's layout."""
    kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = kp.reshape(4, 2, 4, 2, 3, 64)  # (A,p,B,q,c,o)
    if order == "pqc":
        w2 = w2.transpose(0, 2, 1, 3, 4, 5)  # (A,B,p,q,c,o)
    elif order == "cpq":
        w2 = w2.transpose(0, 2, 4, 1, 3, 5)  # (A,B,c,p,q,o)
    else:
        raise ValueError(order)
    return w2.reshape(4, 4, 12, 64)


def _conv4(x2: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x2, w2.astype(x2.dtype), (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def v_reshape(x, k):  # current SpaceToDepthStem lowering
    b, h, w, c = x.shape
    x2 = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return _conv4(x2.reshape(b, h // 2, w // 2, 4 * c), _w2_from(k))


def v_patches(x, k):  # s2d via conv_general_dilated_patches (lowers to conv)
    b, h, w, c = x.shape
    x2 = lax.conv_general_dilated_patches(
        x, (2, 2), (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # channels ordered (c, p, q)
    return _conv4(x2, _w2_from(k, order="cpq"))


def v_slices(x, k):  # 4 strided slices + concat, (p,q) major to match pqc
    parts = [x[:, p::2, q::2, :] for p in (0, 1) for q in (0, 1)]
    return _conv4(jnp.concatenate(parts, axis=-1), _w2_from(k))


def v_conv7(x, k):  # the reference's plain 7x7/s2
    return lax.conv_general_dilated(
        x, k.astype(x.dtype), (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def v_conv8(x, k):  # 8x8/s2 with the kernel zero-padded (exact same output)
    kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
    return lax.conv_general_dilated(
        x, kp.astype(x.dtype), (2, 2), [(4, 2), (4, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


VARIANTS = {
    "reshape-transpose": v_reshape,
    "patches-conv": v_patches,
    "slice-concat": v_slices,
    "conv7x7/s2": v_conv7,
    "conv8x8/s2": v_conv8,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--hw", type=int, default=640)
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(args.b, args.hw, args.hw, 3)).astype(np.float32),
        jnp.bfloat16,
    )
    k = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32) * 0.05)

    ref = None
    for name, fn in VARIANTS.items():
        jfn = jax.jit(lambda x, i, fn=fn: fn(x + (i * 1e-9).astype(x.dtype), k))
        out = jax.block_until_ready(jfn(x, jnp.float32(0)))
        if ref is None:
            ref = np.asarray(out, np.float32)
        else:
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
            scale = float(np.max(np.abs(ref))) or 1.0
            assert err / scale < 2e-2, (name, err, scale)
        tdir = f"/tmp/probe_s2d_{name.replace('/', '_')}"
        shutil.rmtree(tdir, ignore_errors=True)
        jax.profiler.start_trace(tdir)
        try:
            for i in range(1, args.n + 1):
                out = jfn(x, jnp.float32(i))
            jax.block_until_ready(out)
        finally:
            jax.profiler.stop_trace()
        traces = sorted(glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True))
        with gzip.open(traces[-1], "rt") as f:
            trace = json.load(f)
        pid_names, tid_names = {}, {}
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
            if ev.get("ph") == "M" and ev.get("name") == "thread_name":
                tid_names[(ev["pid"], ev["tid"])] = ev.get("args", {}).get("name", "")
        dev = {
            p for p, nm in pid_names.items()
            if any(s in nm.lower() for s in ("tpu", "device", "axon"))
            and "host" not in nm.lower()
        }
        agg = defaultdict(float)
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") != "X" or ev.get("pid") not in dev:
                continue
            if tid_names.get((ev["pid"], ev["tid"])) != "XLA Ops":
                continue
            a = ev.get("args", {}) or {}
            agg[a.get("hlo_category", "?")] += float(ev.get("dur", 0.0))
        total = sum(agg.values()) / args.n / 1e3
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:3]
        detail = ", ".join(f"{c} {v / args.n / 1e3:.3f}" for c, v in top)
        print(f"{name:20s} total {total:7.3f} ms/call   [{detail}]")


if __name__ == "__main__":
    main()
