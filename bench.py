"""Benchmark harness: DESTR-R50 train-step throughput on the attached chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
ratio against the first value this harness recorded (stored in
``BASELINE.md``'s measured table once available); 1.0 until then.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeat bench runs skip the (minutes-long on a
# tunneled chip) XLA compile of the train step
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# first recorded value of this same benchmark (BASELINE.md measured table,
# round 1: 322.35 images/sec/chip on one v5e chip) — vs_baseline tracks
# improvement across rounds against this anchor
BASELINE_IMAGES_PER_SEC: float | None = 322.35

BATCH = 8
IMAGE = 640
STEPS = 20


def main() -> None:
    from object_detection_destr_tpu.config import DestrConfig, TrainConfig
    from object_detection_destr_tpu.models.destr.model import build_destr
    from object_detection_destr_tpu.train.state import create_destr_state
    from object_detection_destr_tpu.train.steps import make_destr_train_step

    config = DestrConfig(compute_dtype="bfloat16")
    train_cfg = TrainConfig(batch_size=BATCH, image_size=IMAGE)
    model = build_destr(config)
    state, tx = create_destr_state(model, train_cfg, image_size=IMAGE)
    train_step = make_destr_train_step(model, tx, train_cfg)

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

    # warmup / compile
    state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = train_step(state, batch)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * STEPS / dt
    vs = (
        images_per_sec / BASELINE_IMAGES_PER_SEC
        if BASELINE_IMAGES_PER_SEC
        else 1.0
    )
    print(
        json.dumps(
            {
                "metric": "DESTR-R50 train images/sec/chip (bf16, 640px, b8)",
                "value": round(images_per_sec, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
