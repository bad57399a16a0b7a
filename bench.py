"""Benchmark harness: DESTR-R50 throughput on the attached chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Measurement method: chained per-dispatch timing — each step's output feeds
the next step's input (train chains through the donated, mutating state;
infer perturbs the image tensor with a data-dependent epsilon so inputs are
bitwise-fresh every step), so iterations can neither overlap nor be served
from any (executable, args) result cache in the tunneled runtime. The best
of REPEATS measurement windows is reported: the attached chip is pooled and
contention varies between windows (observed 9x swings on identical code);
max-of-windows estimates uncontended hardware capability. Calibrated against
a known-FLOPs chained matmul (107 TFLOP/s ~= 54% of v5e bf16 peak).

Env overrides: BENCH_BATCH, BENCH_IMAGE, BENCH_STEPS, BENCH_MODE=train|infer.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeat bench runs skip the (minutes-long on a
# tunneled chip) XLA compile
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# round-1 anchor for this benchmark's default config (BASELINE.md measured
# table); vs_baseline tracks improvement across rounds against it
BASELINE_IMAGES_PER_SEC: float | None = 107.9  # r1 anchor (BASELINE.md)

BATCH = int(os.environ.get("BENCH_BATCH", 8))
IMAGE = int(os.environ.get("BENCH_IMAGE", 640))
STEPS = int(os.environ.get("BENCH_STEPS", 20))
MODE = os.environ.get("BENCH_MODE", "train")  # train | infer
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))


def main() -> None:
    from object_detection_destr_tpu.config import DestrConfig, TrainConfig
    from object_detection_destr_tpu.models.destr.model import build_destr
    from object_detection_destr_tpu.train.state import create_destr_state

    config = DestrConfig(compute_dtype="bfloat16")
    train_cfg = TrainConfig(batch_size=BATCH, image_size=IMAGE)
    model = build_destr(config)
    state, tx = create_destr_state(model, train_cfg, image_size=IMAGE)

    rng = np.random.default_rng(0)
    t = 32
    batch = {
        "images": jnp.asarray(rng.normal(size=(BATCH, IMAGE, IMAGE, 3)).astype(np.float32)),
        "boxes": jnp.asarray(
            np.stack(
                [
                    rng.uniform(0.1, 0.4, size=(BATCH, t)),
                    rng.uniform(0.1, 0.4, size=(BATCH, t)),
                    rng.uniform(0.5, 0.9, size=(BATCH, t)),
                    rng.uniform(0.5, 0.9, size=(BATCH, t)),
                ],
                -1,
            ).astype(np.float32)
        ),
        "labels": jnp.zeros((BATCH, t), jnp.int32),
        "valid": jnp.ones((BATCH, t), bool),
    }
    targets = {k: batch[k] for k in ("boxes", "labels", "valid")}

    if MODE == "infer":

        @jax.jit
        def fwd_chained(params, stats, images):
            """One forward; returns an image-shaped tensor carrying a true
            data dependency on the outputs, so chained calls serialize."""
            out, _ = model.apply(
                {"params": params, "batch_stats": stats}, images, train=False
            )
            dep = (out["pred_class"].mean() + out["pred_boxes"].mean()).astype(
                images.dtype
            )
            # 1e-3-scale perturbation: bitwise-fresh inputs every step (no
            # result caching), visually negligible drift over 20 steps
            return images + dep * 1e-3

        x = batch["images"]
        x = fwd_chained(state.params, state.batch_stats, x)
        jax.block_until_ready(x)
        dt = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            for _ in range(STEPS):
                x = fwd_chained(state.params, state.batch_stats, x)
            jax.block_until_ready(x)
            w = time.perf_counter() - t0
            dt = w if dt is None else min(dt, w)
    else:
        from object_detection_destr_tpu.train.steps import make_destr_train_step

        step = make_destr_train_step(model, tx, train_cfg)  # donates state
        state, metrics = step(state, batch)
        jax.block_until_ready(metrics)
        dt = None
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            for _ in range(STEPS):
                state, metrics = step(state, batch)
            jax.block_until_ready(metrics)
            w = time.perf_counter() - t0
            dt = w if dt is None else min(dt, w)

    images_per_sec = BATCH * STEPS / dt
    vs = (
        images_per_sec / BASELINE_IMAGES_PER_SEC
        if BASELINE_IMAGES_PER_SEC and MODE == "train" and (BATCH, IMAGE) == (8, 640)
        else 1.0
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"DESTR-R50 {MODE} images/sec/chip "
                    f"(bf16, {IMAGE}px, b{BATCH}, chained steps)"
                ),
                "value": round(images_per_sec, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
