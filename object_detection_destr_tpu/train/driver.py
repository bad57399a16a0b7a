"""Epoch drivers for DESTR and SSD training.

Mirrors the observable behavior of the reference drivers
(train.py:21-138, train_ssd.py:22-91): per-epoch train + validation loss
sweeps, epoch-level mAP (DESTR), best-checkpoint-on-lowest-model-val-loss,
TensorBoard-style scalar tags, epoch wall-clock prints — minus the defects
(writer closed mid-loop at train.py:138; broken resume; per-step host syncs).

TPU-first differences:
    * augmentation is jitted and runs on device right after the host batch
      lands (data/transforms.py);
    * the train step (forward + matcher + losses + backward + update) is one
      XLA program; metrics are fetched once per log interval;
    * with more than one device, batches shard over the ('data',) mesh axis
      and XLA all-reduces gradients over ICI.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import DetectionLoader, build_dataset
from ..data.transforms import (
    destr_eval_transform,
    destr_train_transform,
    ssd_eval_transform,
    ssd_train_transform,
)
from ..losses.metrics import CocoAveragePrecision, MeanAveragePrecision
from ..models.destr.model import build_destr
from ..models.ssd.model import build_ssd
from ..parallel.mesh import auto_mesh, make_mesh, replicated_sharding, shard_batch


def _default_mesh(cfg_t):
    """num_data_shards > 1 pins the data-axis size; otherwise the largest
    device count dividing the batch is used."""
    if cfg_t.num_data_shards > 1:
        return make_mesh(num_data=cfg_t.num_data_shards)
    return auto_mesh(cfg_t.batch_size)
from .checkpoint import restore_checkpoint, save_checkpoint
from .logging_utils import MetricLogger
from .profiler import StepTimer
from .state import create_destr_state, create_ssd_state
from .steps import (
    make_destr_eval_step,
    make_destr_train_step,
    make_ssd_eval_step,
    make_ssd_train_step,
)

__all__ = ["train_destr", "train_ssd"]


def _params_finite(state) -> bool:
    """One jitted all-finite reduction over the parameter tree (one scalar
    fetch per epoch — per-leaf host checks would cost a tunnel RTT each).

    ``optax.apply_if_finite`` fails OPEN: after ``max_consecutive_errors``
    non-finite steps it propagates the bad update, poisoning the params for
    the rest of the run (observed in the r4 production run 3e: divergence at
    epoch 52 burned the remaining 67 epochs as NaN and overwrote the good
    ``_last`` checkpoint with NaN weights). The drivers therefore halt — and
    stop writing checkpoints — the moment the params go non-finite."""
    import jax.numpy as jnp

    leaves = [
        l for l in jax.tree.leaves(state.params)
        if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
    ]
    ok = jax.jit(
        lambda ls: jnp.all(jnp.stack([jnp.all(jnp.isfinite(l)) for l in ls]))
    )(leaves)
    return bool(jax.device_get(ok))


def _halt_diverged(save_as: str, epoch: int) -> None:
    print(
        f"FATAL: non-finite parameters after epoch {epoch} — training has "
        "diverged past the --skip_nonfinite window (optax.apply_if_finite "
        "fails open after max_consecutive_errors). Halting without "
        f"overwriting checkpoints; resume from '{save_as}' (best) or "
        f"'{save_as}_last' with a lower lr.",
        flush=True,
    )


def _try_save(*args) -> None:
    """Per-epoch checkpoint write that cannot kill the run.

    A transient filesystem/serialization failure (observed once as a
    tensorstore ENOENT during the r4 production run) costs one checkpoint,
    not hours of training — the next epoch writes again. The interrupt
    handler still saves unguarded: if THAT fails there is nothing left to
    protect."""
    try:
        save_checkpoint(*args)
    except Exception as e:  # noqa: BLE001 — deliberate catch-all at the epoch boundary
        print(f"WARNING: checkpoint save failed ({type(e).__name__}: {e}); "
              "continuing — next epoch will retry", flush=True)


def _make_ema(decay: float):
    """(init, update) for a per-step parameter EMA (config.ema_decay).

    ``init`` deep-copies the params on device (the train step DONATES the
    state, so aliasing its buffers would leave the EMA reading freed
    memory); ``update`` donates the previous EMA into the new one — one
    fused elementwise pass, ~1 ms on 40M f32 params, off the training
    trajectory entirely (reads params, never writes them)."""
    import jax.numpy as jnp

    init = jax.jit(lambda p: jax.tree.map(jnp.copy, p))
    update = jax.jit(
        lambda ema, p: jax.tree.map(
            lambda e, x: e * decay + x.astype(e.dtype) * (1.0 - decay), ema, p
        ),
        donate_argnums=(0,),
    )
    return init, update


def _make_loaders(config: Config, canvas: int, for_train_model: str, mesh=None):
    data = config.data
    num_classes = {"destr": 1, "ssd": config.ssd.num_cls}[for_train_model]
    # the letterbox paths are DESTR-only: the SSD reference stretches at eval
    # too (transforms.py:141-152) and the SSD model has no pixel-mask input
    is_destr = for_train_model == "destr"
    train_letterbox = config.train.letterbox and is_destr
    # r4 default: DESTR eval geometry is the reference's aspect-preserving
    # Resize(672)+CenterCrop(640) (REFCOMPAT "letterbox eval geometry")
    eval_letterbox = (
        config.train.letterbox or config.train.letterbox_eval
    ) and is_destr
    # under letterbox the synthetic set emits mixed aspect ratios so the
    # padding path is actually exercised (real datasets are non-square)
    aspects = (
        (1.0, 0.7, 1.4)
        if (train_letterbox or eval_letterbox) and data.dataset == "synthetic"
        else (1.0,)
    )
    train_ds = build_dataset(
        data.dataset,
        data.root,
        "train",
        image_size=data.image_size,
        num_samples=data.num_train_samples,
        num_classes=num_classes,
        max_items_per_img=data.max_targets,
        seed=config.train.seed,
        aspect_ratios=aspects,
    )
    valid_split = "valid" if data.dataset in ("voc",) else (
        "val" if data.dataset in ("widerface",) else
        ("val2017" if data.dataset == "coco" else "valid")
    )
    valid_ds = build_dataset(
        data.dataset,
        data.root,
        valid_split,
        image_size=data.image_size,
        num_samples=data.num_valid_samples,
        num_classes=num_classes,
        max_items_per_img=data.max_targets,
        seed=config.train.seed,
        aspect_ratios=aspects,
    )
    train_loader = DetectionLoader(
        train_ds,
        batch_size=config.train.batch_size,
        canvas_size=canvas,
        max_targets=data.max_targets,
        augment_factor=data.augment_factor,
        shuffle=True,
        seed=config.train.seed,
        letterbox=train_letterbox,
        mesh=mesh,
    )
    valid_loader = DetectionLoader(
        valid_ds,
        batch_size=config.train.batch_size,
        canvas_size=canvas,
        max_targets=data.max_targets,
        augment_factor=1,
        shuffle=True,  # reference shuffles the val loader too (train.py:284-290)
        seed=config.train.seed + 1,
        letterbox=eval_letterbox,
        mesh=mesh,
    )
    return train_loader, valid_loader


def _device_batch(raw: dict, transform: Callable, mesh, rng=None):
    """Shard the host batch, then run the jitted augment on device."""
    host = {
        "images": raw["images"],
        "boxes": raw["boxes"],
        "labels": raw["labels"],
        "valid": raw["valid"],
    }
    if "content_hw" in raw:  # letterbox loader: content-extent fractions
        host["content_hw"] = raw["content_hw"]
    batch = shard_batch(host, mesh)
    args = [batch["images"], batch["boxes"], batch["labels"], batch["valid"]]
    if rng is not None:
        args.append(rng)
    if "content_hw" in batch:
        args.append(batch["content_hw"])
    return transform(*args)


def train_destr(config: Config, mesh=None) -> dict:
    """Train DESTR; returns {"best_val", "map", "state"}."""
    cfg_t = config.train
    mesh = mesh or _default_mesh(cfg_t)
    # >1 data shard: steps run under shard_map (Pallas kernels partition by
    # construction) and the mini-detector BNs sync statistics over the mesh
    step_mesh = mesh if mesh.shape["data"] > 1 else None
    destr_cfg = (
        dataclasses.replace(config.destr, bn_axis_name="data")
        if step_mesh is not None else config.destr
    )
    canvas = int(cfg_t.image_size * 672 / 640)  # reference eval geometry
    train_loader, valid_loader = _make_loaders(config, canvas, "destr", mesh=mesh)
    if config.data.device_cache:
        from ..data.device_cache import DeviceCachedLoader

        train_loader = DeviceCachedLoader(train_loader, mesh)
        valid_loader = DeviceCachedLoader(valid_loader, mesh)

    model = build_destr(destr_cfg)
    state, tx = create_destr_state(
        model, cfg_t, image_size=cfg_t.image_size,
        steps_per_epoch=len(train_loader),  # lr_drop boundary in steps
    )
    train_step = make_destr_train_step(model, tx, cfg_t, mesh=step_mesh)
    eval_step = make_destr_eval_step(model, cfg_t, mesh=step_mesh)
    metric = MeanAveragePrecision(num_cls=1, num_pred=config.destr.top_k)
    coco_metric = (
        CocoAveragePrecision(num_cls=max(config.destr.num_cls - 1, 1))
        if cfg_t.coco_eval
        else None
    )

    logger = MetricLogger(cfg_t.log_dir)
    best_val = np.inf
    if cfg_t.resume:
        restored = restore_checkpoint(cfg_t.checkpoint_dir, cfg_t.resume_from, state)
        state = restored["state"]
        train_loader.load_state_dict(restored["loader"])
        best_val = float(restored["best_val"])
    # params/opt state replicated over the mesh (batch shards on 'data')
    state = jax.device_put(state, replicated_sharding(mesh))

    aug_rng = jax.random.key(cfg_t.seed + 7)
    out_size = cfg_t.image_size
    train_tf = lambda im, bx, lb, vd, key, content=None: destr_train_transform(
        im, bx, lb, vd, key, content, out_size=out_size
    )
    eval_tf = lambda im, bx, lb, vd, content=None: destr_eval_transform(
        im, bx, lb, vd, content, resize_to=canvas, out_size=out_size
    )
    epoch_runner = None
    if cfg_t.epoch_scan and not cfg_t.profile_dir:  # profiling needs per-step
        if not config.data.device_cache:
            print("epoch_scan ignored: requires --device_cache", flush=True)
        else:
            from .epoch_scan import make_epoch_runner

            epoch_runner = make_epoch_runner(
                make_destr_train_step(model, tx, cfg_t, mesh=step_mesh,
                                      wrap=False),
                lambda b, key: destr_train_transform(
                    b["images"], b["boxes"], b["labels"], b["valid"], key,
                    b.get("content_hw"), out_size=out_size,
                ),
                ema_decay=cfg_t.ema_decay or None,
                mesh=step_mesh,
            )

    last_map = 0.0
    timer = StepTimer(cfg_t.batch_size)
    host_step = int(jax.device_get(state.step))  # one sync; counted on host after

    ema_params = None
    if cfg_t.ema_decay:
        ema_init, ema_update = _make_ema(cfg_t.ema_decay)
        ema_params = ema_init(state.params)  # resume seeds EMA from params
        best_ema_val = np.inf

    def _val_sweep(eval_state):
        """One validation pass: (val_means, mAP, coco_mAP-or-None)."""
        metric_state = metric.init_state()
        if coco_metric is not None:
            coco_metric.reset()
        val_metrics: list = []
        for raw in valid_loader:
            batch = _device_batch(raw, eval_tf, mesh)
            outputs, m = eval_step(eval_state, batch)
            val_targets = {
                "boxes": batch["boxes"],
                "labels": batch["labels"],
                "valid": batch["valid"],
            }
            metric_state = metric.update(metric_state, outputs, val_targets)
            if coco_metric is not None:
                coco_metric.update(outputs, val_targets)
            val_metrics.append(m)
        fetched = jax.device_get(val_metrics)
        val_means = (
            {k: float(np.mean([f[k] for f in fetched])) for k in fetched[0]}
            if fetched
            else {}
        )
        coco_val = coco_metric.compute() if coco_metric is not None else None
        return val_means, metric.compute(metric_state), coco_val

    try:
        for epoch in range(cfg_t.epochs):
            t0 = time.time()
            # ---- train ----
            metrics = None
            timer.start()
            if epoch_runner is not None:
                # ---- scanned epoch: ONE dispatch (train/epoch_scan.py) ----
                _, idx = train_loader.epoch_index_matrix()
                state, ema_params, stacked = epoch_runner(
                    state, ema_params, train_loader.data,
                    jnp.asarray(idx), jnp.int32(host_step), aug_rng,
                )
                fetched = jax.device_get(stacked)  # forces epoch completion
                n_steps = int(idx.shape[0])
                for i in range(n_steps):
                    host_step += 1
                    timer.step()
                    logger.accumulate(
                        host_step, {k: v[i] for k, v in fetched.items()}
                    )
                    if (i + 1) % cfg_t.log_interval == 0:
                        logger.flush("train")
                train_loader.advance_epoch()
                metrics = (
                    {k: v[-1] for k, v in fetched.items()} if n_steps else None
                )
            else:
                for step_in_epoch, raw in enumerate(train_loader):
                    if cfg_t.profile_dir and epoch == 0 and step_in_epoch == 2:
                        jax.profiler.start_trace(cfg_t.profile_dir)
                    # host-side step counter: int(state.step) would force a
                    # device sync (a full tunnel RTT) every iteration
                    step_key = jax.random.fold_in(aug_rng, host_step)
                    batch = _device_batch(raw, train_tf, mesh, step_key)
                    state, metrics = train_step(state, batch)
                    if ema_params is not None:
                        ema_params = ema_update(ema_params, state.params)
                    host_step += 1
                    timer.step()
                    if cfg_t.profile_dir and epoch == 0 and step_in_epoch == 4:
                        jax.block_until_ready(metrics)
                        jax.profiler.stop_trace()
                    logger.accumulate(host_step, metrics)
                    if (step_in_epoch + 1) % cfg_t.log_interval == 0:
                        logger.flush("train")
            logger.flush("train")
            if metrics is not None:
                rate = timer.stop(metrics["loss"])
                logger.scalar("Perf/images_per_sec", rate["images_per_sec"], host_step)

            # ---- validate ----
            do_val = (
                (epoch + 1) % max(cfg_t.val_interval, 1) == 0
                or epoch == cfg_t.epochs - 1
            )
            val_model = ema_val_model = None
            if do_val:
                val_means, last_map, coco_val = _val_sweep(state)
                for k, v in val_means.items():
                    logger.scalar(f"Loss/valid/{k}", v, host_step)
                logger.scalar("Metric/mAP", last_map, host_step)
                if coco_val is not None:
                    logger.scalar("Metric/coco_mAP", coco_val, host_step)
                if ema_params is not None:
                    ema_state = state.replace(params=ema_params)
                    ema_means, ema_map, ema_coco = _val_sweep(ema_state)
                    for k, v in ema_means.items():
                        logger.scalar(f"Loss/valid_ema/{k}", v, host_step)
                    logger.scalar("Metric/ema_mAP", ema_map, host_step)
                    if ema_coco is not None:
                        logger.scalar("Metric/ema_coco_mAP", ema_coco, host_step)
                    ema_val_model = ema_means.get("loss_model", np.inf)
                val_model = val_means.get("loss_model", np.inf)

            # ---- divergence halt: never checkpoint NaN params
            if not _params_finite(state):
                _halt_diverged(cfg_t.save_as, epoch)
                break

            # ---- best checkpoint on lowest model val loss (train.py:123-128)
            if val_model is not None and val_model < best_val:
                best_val = val_model
                _try_save(
                    cfg_t.checkpoint_dir,
                    cfg_t.save_as,
                    state,
                    train_loader.state_dict(),
                    best_val,
                )
            if ema_val_model is not None and ema_val_model < best_ema_val:
                best_ema_val = ema_val_model
                _try_save(
                    cfg_t.checkpoint_dir,
                    cfg_t.save_as + "_ema",
                    state.replace(params=ema_params),
                    train_loader.state_dict(),
                    best_ema_val,
                )
            if (
                do_val
                or (epoch + 1) % max(cfg_t.save_interval, 1) == 0
                or epoch == cfg_t.epochs - 1
            ):
                _try_save(
                    cfg_t.checkpoint_dir,
                    cfg_t.save_as + "_last",
                    state,
                    train_loader.state_dict(),
                    best_val,
                )
            ema_note = (
                f" ema_val={ema_val_model:.4f} ema_mAP={ema_map:.4f}"
                if ema_val_model is not None
                else ""
            )
            val_note = (
                f" val_model={val_model:.4f} mAP={last_map:.4f}"
                if do_val
                else ""
            )
            print(
                f"epoch {epoch}: {time.time() - t0:.1f}s{val_note}{ema_note}",
                flush=True,
            )
    except KeyboardInterrupt:
        # crash/preemption recovery (SURVEY.md §5): persist a resumable
        # checkpoint before exiting — the reference loses the epoch
        save_checkpoint(
            cfg_t.checkpoint_dir, cfg_t.save_as + "_interrupt", state,
            train_loader.state_dict(), best_val,
        )
        print("interrupted: checkpoint saved as "
              f"{cfg_t.save_as}_interrupt", flush=True)
        raise
    logger.close()
    return {"best_val": best_val, "map": last_map, "state": state}


def train_ssd(config: Config, mesh=None) -> dict:
    """Train SSD; returns {"best_val", "state"}."""
    cfg_t = config.train
    mesh = mesh or _default_mesh(cfg_t)
    step_mesh = mesh if mesh.shape["data"] > 1 else None
    ssd_cfg = (
        dataclasses.replace(config.ssd, bn_axis_name="data")
        if step_mesh is not None else config.ssd
    )
    canvas = int(config.ssd.image_size * 1.28)  # headroom for the random patch
    train_loader, valid_loader = _make_loaders(config, canvas, "ssd", mesh=mesh)
    if config.data.device_cache:
        from ..data.device_cache import DeviceCachedLoader

        train_loader = DeviceCachedLoader(train_loader, mesh)
        valid_loader = DeviceCachedLoader(valid_loader, mesh)

    model = build_ssd(ssd_cfg)
    state, tx = create_ssd_state(
        model, cfg_t, image_size=ssd_cfg.image_size,
        steps_per_epoch=len(train_loader),
    )
    train_step = make_ssd_train_step(model, tx, cfg_t, ssd_cfg, mesh=step_mesh)
    eval_step = make_ssd_eval_step(model, cfg_t, ssd_cfg, mesh=step_mesh)
    metric = MeanAveragePrecision(num_cls=config.ssd.num_cls)

    logger = MetricLogger(cfg_t.log_dir)
    best_val = np.inf
    if cfg_t.resume:
        restored = restore_checkpoint(cfg_t.checkpoint_dir, cfg_t.resume_from, state)
        state = restored["state"]
        train_loader.load_state_dict(restored["loader"])
        best_val = float(restored["best_val"])
    state = jax.device_put(state, replicated_sharding(mesh))

    aug_rng = jax.random.key(cfg_t.seed + 13)
    out_size = config.ssd.image_size
    train_tf = lambda im, bx, lb, vd, key: ssd_train_transform(
        im, bx, lb, vd, key, out_size=out_size
    )
    epoch_runner = None
    if cfg_t.epoch_scan:
        if not config.data.device_cache:
            print("epoch_scan ignored: requires --device_cache", flush=True)
        else:
            from .epoch_scan import make_epoch_runner

            epoch_runner = make_epoch_runner(
                make_ssd_train_step(
                    model, tx, cfg_t, ssd_cfg, mesh=step_mesh, wrap=False
                ),
                lambda b, key: ssd_train_transform(
                    b["images"], b["boxes"], b["labels"], b["valid"], key,
                    out_size=out_size,
                ),
                ema_decay=cfg_t.ema_decay or None,
                mesh=step_mesh,
            )
    eval_tf = lambda im, bx, lb, vd: ssd_eval_transform(im, bx, lb, vd, out_size=out_size)

    host_step = int(jax.device_get(state.step))

    ema_params = None
    if cfg_t.ema_decay:
        ema_init, ema_update = _make_ema(cfg_t.ema_decay)
        ema_params = ema_init(state.params)  # resume seeds EMA from params
        best_ema_val = np.inf

    def _val_sweep(eval_state):
        """One validation pass: (val_means, mAP)."""
        from ..geometry.boxes import cxcyhw_to_xyxy

        val_metrics = []
        metric_state = metric.init_state()
        for raw in valid_loader:
            batch = _device_batch(raw, eval_tf, mesh)
            _, m, detections = eval_step(eval_state, batch)
            # SSD targets are cxcyhw; the metric compares in xyxy
            metric_state = metric.update(
                metric_state,
                detections,
                {
                    "boxes": cxcyhw_to_xyxy(batch["boxes"]),
                    "labels": batch["labels"],
                    "valid": batch["valid"],
                },
            )
            val_metrics.append(m)
        fetched = jax.device_get(val_metrics)
        val_means = (
            {k: float(np.mean([f[k] for f in fetched])) for k in fetched[0]}
            if fetched
            else {}
        )
        return val_means, metric.compute(metric_state)

    try:
        for epoch in range(cfg_t.epochs):
            t0 = time.time()
            if epoch_runner is not None:
                # ---- scanned epoch: ONE dispatch (train/epoch_scan.py) ----
                _, idx = train_loader.epoch_index_matrix()
                state, ema_params, stacked = epoch_runner(
                    state, ema_params, train_loader.data,
                    jnp.asarray(idx), jnp.int32(host_step), aug_rng,
                )
                fetched = jax.device_get(stacked)  # forces epoch completion
                for i in range(int(idx.shape[0])):
                    host_step += 1
                    logger.accumulate(
                        host_step, {k: v[i] for k, v in fetched.items()}
                    )
                    if (i + 1) % cfg_t.log_interval == 0:
                        logger.flush("train")
                train_loader.advance_epoch()
            else:
                for step_in_epoch, raw in enumerate(train_loader):
                    step_key = jax.random.fold_in(aug_rng, host_step)
                    batch = _device_batch(raw, train_tf, mesh, step_key)
                    state, metrics = train_step(state, batch)
                    if ema_params is not None:
                        ema_params = ema_update(ema_params, state.params)
                    host_step += 1
                    logger.accumulate(host_step, metrics)
                    if (step_in_epoch + 1) % cfg_t.log_interval == 0:
                        logger.flush("train")
            logger.flush("train")

            do_val = (
                (epoch + 1) % max(cfg_t.val_interval, 1) == 0
                or epoch == cfg_t.epochs - 1
            )
            val_loss = ema_val_loss = None
            val_map = np.nan
            if do_val:
                val_means, val_map = _val_sweep(state)
                for k, v in val_means.items():
                    logger.scalar(f"Loss/valid/{k}", v, host_step)
                logger.scalar("Metric/mAP", val_map, host_step)
                if ema_params is not None:
                    ema_means, ema_map = _val_sweep(
                        state.replace(params=ema_params)
                    )
                    for k, v in ema_means.items():
                        logger.scalar(f"Loss/valid_ema/{k}", v, host_step)
                    logger.scalar("Metric/ema_mAP", ema_map, host_step)
                    ema_val_loss = ema_means.get("loss", np.inf)
                val_loss = val_means.get("loss", np.inf)

            if not _params_finite(state):
                _halt_diverged(cfg_t.save_as, epoch)
                break

            if val_loss is not None and val_loss < best_val:
                best_val = val_loss
                _try_save(
                    cfg_t.checkpoint_dir, cfg_t.save_as, state,
                    train_loader.state_dict(), best_val,
                )
            if ema_val_loss is not None and ema_val_loss < best_ema_val:
                best_ema_val = ema_val_loss
                _try_save(
                    cfg_t.checkpoint_dir, cfg_t.save_as + "_ema",
                    state.replace(params=ema_params),
                    train_loader.state_dict(), best_ema_val,
                )
            if (
                do_val
                or (epoch + 1) % max(cfg_t.save_interval, 1) == 0
                or epoch == cfg_t.epochs - 1
            ):
                _try_save(
                    cfg_t.checkpoint_dir, cfg_t.save_as + "_last", state,
                    train_loader.state_dict(), best_val,
                )
            ema_note = (
                f" ema_val={ema_val_loss:.4f} ema_mAP={ema_map:.4f}"
                if ema_val_loss is not None
                else ""
            )
            val_note = (
                f" val={val_loss:.4f} mAP={val_map:.4f}" if do_val else ""
            )
            print(
                f"epoch {epoch}: {time.time() - t0:.1f}s{val_note}{ema_note}",
                flush=True,
            )
    except KeyboardInterrupt:
        save_checkpoint(
            cfg_t.checkpoint_dir, cfg_t.save_as + "_interrupt", state,
            train_loader.state_dict(), best_val,
        )
        print("interrupted: checkpoint saved as "
              f"{cfg_t.save_as}_interrupt", flush=True)
        raise
    logger.close()
    return {"best_val": best_val, "state": state}
