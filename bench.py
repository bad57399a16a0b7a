"""Benchmark harness: detector throughput on the attached chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Measurement method (train): the PROFILER TRACE is the timing source — the
median device duration of the 'Steps' track over a STEPS-step window. The
r2 profile proved wall-clock timing on the pooled relay dishonest: donated
chained steps wall-clocked ~11 ms/step while the trace shows ~100 ms/step
of device-busy execution (the relay acknowledges completions early), so r1's
wall numbers overstated throughput ~9x. Chained-wall windows are still run
(and printed to stderr for comparison) but the reported value is
device-time. Full notes: BASELINE.md r2 section.

Env overrides: BENCH_BATCH, BENCH_IMAGE, BENCH_STEPS,
BENCH_MODE=train|infer|eval (eval = DESTR fwd + matching/losses, the val
sweep's step), BENCH_MODEL=destr|ssd, BENCH_BACKBONE=resnet50|resnet101,
BENCH_DILATION=1, BENCH_LETTERBOX=1 (DESTR: mixed-aspect pixel-valid masks
through the model — the r4 aspect-preserving eval default; REFCOMPAT
"letterbox eval geometry"), BENCH_MOMENT_DTYPE=bfloat16 (narrow Adam
moment storage, train/optim.py::scale_by_adam_compact — the r5 optimizer
HBM-floor A/B), BENCH_EXTRA_BATCH (default 32; 0 disables the
companion measurement).

The default config additionally measures a b32 window (device time as well)
and appends it to the metric text — recorded every round per VERDICT r1 #10.
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

# Device-time anchor for the default config: the r1 code measured 100.25
# ms/step of device-busy time at b8/640 via the profiler trace (r2 profile,
# BASELINE.md) -> 79.8 img/s/chip. vs_baseline tracks improvement against
# it using the same (trace-based) method. The r1 wall-clock anchor (107.9)
# and r1 wall numbers were relay artifacts — the pooled tunnel reports
# completions early even for donated chains; see BASELINE.md r2 notes.
BASELINE_IMAGES_PER_SEC: float | None = 79.8

BATCH = int(os.environ.get("BENCH_BATCH", 8))
IMAGE = int(os.environ.get("BENCH_IMAGE", 640))
STEPS = int(os.environ.get("BENCH_STEPS", 20))
MODE = os.environ.get("BENCH_MODE", "train")  # train | infer | eval
LETTERBOX = os.environ.get("BENCH_LETTERBOX", "0") == "1"
MODEL = os.environ.get("BENCH_MODEL", "destr")  # destr | ssd
BACKBONE = os.environ.get("BENCH_BACKBONE", "resnet50")
DILATION = os.environ.get("BENCH_DILATION", "0") == "1"
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))

_TIMING_METHOD = "profiler device-time"


def _fake_batch(rng, image: int, cxcyhw: bool, batch_size: int | None = None) -> dict:
    b = batch_size or BATCH
    t = 32
    boxes = np.stack(
        [
            rng.uniform(0.3, 0.7, size=(b, t)),
            rng.uniform(0.3, 0.7, size=(b, t)),
            rng.uniform(0.1, 0.4, size=(b, t)),
            rng.uniform(0.1, 0.4, size=(b, t)),
        ],
        -1,
    ).astype(np.float32)
    if not cxcyhw:  # DESTR targets are xyxy
        cx, cy, h, w = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
        boxes = np.stack(
            [
                np.maximum(cx - w / 2, 0),
                np.maximum(cy - h / 2, 0),
                np.minimum(cx + w / 2, 1),
                np.minimum(cy + h / 2, 1),
            ],
            -1,
        )
    batch = {
        "images": jnp.asarray(
            rng.normal(size=(b, image, image, 3)).astype(np.float32)
        ),
        "boxes": jnp.asarray(boxes),
        "labels": jnp.zeros((b, t), jnp.int32),
        "valid": jnp.ones((b, t), bool),
    }
    if LETTERBOX and not cxcyhw:  # DESTR only: SSD has no pixel-mask input
        # mixed-aspect letterbox masks: even images are content-padded on W
        # (portrait sources), odd on H — the eval default's real mask shape
        mask = np.zeros((b, image, image), bool)
        for i in range(b):
            frac = 0.75
            if i % 2 == 0:
                mask[i, :, : int(image * frac)] = True
            else:
                mask[i, : int(image * frac), :] = True
        batch["pixel_valid"] = jnp.asarray(mask)
    return batch


def _time_windows(run_once) -> float:
    dt = None
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run_once()
        w = time.perf_counter() - t0
        dt = w if dt is None else min(dt, w)
    return dt


def _device_time_or(wall_dt: float, run_once, batch: int) -> float:
    """Trace one window and return STEPS * median device step time — the
    honest measure on the pooled relay, which reports completions early even
    for donated chains (r2 profile: ~100 ms/step device-busy where the wall
    clock claimed ~11 ms). Falls back to the wall window if no trace is
    produced (e.g. CPU)."""
    import statistics
    import tempfile

    from object_detection_destr_tpu.train.profiler import device_step_seconds

    global _TIMING_METHOD
    try:
        with tempfile.TemporaryDirectory(prefix="bench_trace_") as td:
            jax.profiler.start_trace(td)
            try:
                run_once()
            finally:
                # always stop: a run_once failure must not leave the profiler
                # running and silently poison the next trace window
                jax.profiler.stop_trace()
            steps = device_step_seconds(td)
        if not steps:
            _TIMING_METHOD = "WALL-CLOCK (no trace steps; UNRELIABLE on the relay)"
            return wall_dt
        dev = statistics.median(steps) * STEPS
        import sys

        print(
            f"# device-step median {statistics.median(steps) * 1e3:.2f} ms "
            f"({len(steps)} steps traced); wall window "
            f"{wall_dt / STEPS * 1e3:.2f} ms/step",
            file=sys.stderr,
            flush=True,
        )
        return max(dev, 0.0) or wall_dt
    except Exception as e:
        # label honestly: a wall-clock fallback is NOT device time
        _TIMING_METHOD = (
            f"WALL-CLOCK (trace failed: {type(e).__name__}; UNRELIABLE on the relay)"
        )
        return wall_dt


def main() -> None:
    from object_detection_destr_tpu.config import DestrConfig, SSDConfig, TrainConfig

    rng = np.random.default_rng(0)
    train_cfg = TrainConfig(
        batch_size=BATCH,
        image_size=IMAGE,
        # A/B hook for the optimizer-moment storage dtype (BASELINE.md r5
        # optimizer HBM floor); default float32 = the recipe of record
        moment_dtype=os.environ.get("BENCH_MOMENT_DTYPE", "float32"),
    )

    if MODEL == "ssd":
        from object_detection_destr_tpu.models.ssd.model import build_ssd
        from object_detection_destr_tpu.train.state import create_ssd_state
        from object_detection_destr_tpu.train.steps import make_ssd_train_step

        ssd_cfg = SSDConfig(compute_dtype="bfloat16")
        image = ssd_cfg.image_size  # the pyramid closes only at 300px
        model = build_ssd(ssd_cfg)
        state, tx = create_ssd_state(model, train_cfg, image_size=image)
        step = make_ssd_train_step(model, tx, train_cfg, ssd_cfg)
        batch = _fake_batch(rng, image, cxcyhw=True)
        name = "SSD-VGG16"
    else:
        from object_detection_destr_tpu.models.destr.model import build_destr
        from object_detection_destr_tpu.train.state import create_destr_state
        from object_detection_destr_tpu.train.steps import make_destr_train_step

        config = DestrConfig(
            compute_dtype="bfloat16", backbone=BACKBONE, dilation=DILATION
        )
        image = IMAGE
        model = build_destr(config)
        state, tx = create_destr_state(model, train_cfg, image_size=image)
        step = make_destr_train_step(model, tx, train_cfg)
        batch = _fake_batch(rng, image, cxcyhw=False)
        name = f"DESTR-{BACKBONE.replace('resnet', 'R')}{'-dil' if DILATION else ''}"
        if LETTERBOX:
            name += "-letterbox"

    if MODE == "infer":
        pixel_valid = batch.get("pixel_valid")

        @jax.jit
        def fwd_chained(params, stats, images):
            """One forward; output feeds back into the image tensor so
            chained calls serialize and inputs stay bitwise-fresh."""
            kwargs = {"train": False}
            if pixel_valid is not None:  # letterbox eval-path mask (DESTR)
                kwargs["valid_mask"] = pixel_valid
            out = model.apply(
                {"params": params, "batch_stats": stats}, images, **kwargs
            )
            leaves = jax.tree.leaves(out)
            dep = sum(l.mean().astype(images.dtype) for l in leaves)
            return images + dep * 1e-3

        x = batch["images"]
        x = fwd_chained(state.params, state.batch_stats, x)
        jax.block_until_ready(x)

        def window():
            nonlocal x
            for _ in range(STEPS):
                x = fwd_chained(state.params, state.batch_stats, x)
            jax.block_until_ready(x)

        dt = _time_windows(window)
        dt = _device_time_or(dt, window, BATCH)
    elif MODE == "eval":
        # the validation sweep's step: forward + on-device matching/losses
        # (steps.py::make_destr_eval_step / make_ssd_eval_step)
        if MODEL == "ssd":
            from object_detection_destr_tpu.train.steps import make_ssd_eval_step

            eval_step = make_ssd_eval_step(model, train_cfg, ssd_cfg)
        else:
            from object_detection_destr_tpu.train.steps import make_destr_eval_step

            eval_step = make_destr_eval_step(model, train_cfg)
        out = eval_step(state, batch)
        jax.block_until_ready(out)

        def window():
            nonlocal out
            for _ in range(STEPS):
                out = eval_step(state, batch)
            jax.block_until_ready(out)

        dt = _time_windows(window)
        dt = _device_time_or(dt, window, BATCH)
    else:
        state, metrics = step(state, batch)  # compile; donates state
        jax.block_until_ready(metrics)

        def window():
            nonlocal state, metrics
            for _ in range(STEPS):
                state, metrics = step(state, batch)
            jax.block_until_ready(metrics)

        dt = _time_windows(window)
        dt = _device_time_or(dt, window, BATCH)

    images_per_sec = BATCH * STEPS / dt
    default_config = (
        MODE == "train" and MODEL == "destr" and BACKBONE == "resnet50"
        and not DILATION and not LETTERBOX and (BATCH, IMAGE) == (8, 640)
    )
    vs = (
        images_per_sec / BASELINE_IMAGES_PER_SEC
        if BASELINE_IMAGES_PER_SEC and default_config
        else 1.0
    )

    extra_txt = ""
    extra_batch = int(os.environ.get("BENCH_EXTRA_BATCH", 32))
    if default_config and extra_batch:
        try:
            from object_detection_destr_tpu.train.state import create_destr_state
            from object_detection_destr_tpu.train.steps import make_destr_train_step

            cfg32 = TrainConfig(batch_size=extra_batch, image_size=image)
            state32, tx32 = create_destr_state(model, cfg32, image_size=image)
            step32 = make_destr_train_step(model, tx32, cfg32)
            batch32 = _fake_batch(rng, image, cxcyhw=False, batch_size=extra_batch)
            state32, m32 = step32(state32, batch32)
            jax.block_until_ready(m32)

            def window32():
                nonlocal state32, m32
                for _ in range(STEPS):
                    state32, m32 = step32(state32, batch32)
                jax.block_until_ready(m32)

            dt32 = _time_windows(window32)
            dt32 = _device_time_or(dt32, window32, extra_batch)
            extra_txt = (
                f"; b{extra_batch}: {extra_batch * STEPS / dt32:.0f} img/s "
                f"(device-capability companion)"
            )
        except Exception as e:  # never fail the round artifact over the extra
            extra_txt = f"; b{extra_batch}: unavailable ({type(e).__name__})"

    print(
        json.dumps(
            {
                "metric": (
                    f"{name} {MODE} images/sec/chip "
                    f"(bf16, {image}px, b{BATCH}, {_TIMING_METHOD}; "
                    f"r1 wall numbers were relay artifacts; vs_baseline is "
                    f"vs the r1-CODE device-time anchor "
                    f"{BASELINE_IMAGES_PER_SEC} img/s, NOT vs PyTorch — "
                    f"the reference publishes no numbers and no GPU exists "
                    f"here, see BASELINE.md){extra_txt}"
                ),
                "value": round(images_per_sec, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
