"""Divergence post-mortem: replay training from a checkpoint with per-STEP
instrumentation (VERDICT r4 weak #2 / directive #2).

The r4 production run 3e diverged at global step ~6700 (epoch 52): every
loss component jumped 3-4x inside one 32-step logging window, NaN'd within
~100 steps, and ``optax.apply_if_finite`` failed open. The 32-step window
means of the training logs cannot localize the event; this tool replays
the run from the saved pre-divergence checkpoint and logs per step.

Bit-exactness: the trajectory is evolved by the SAME jitted train step the
production driver runs (``steps.make_destr_train_step`` — on a 1-device
mesh the driver's step_mesh is None, so plain jit), restored from the same
Orbax checkpoint, fed the same deterministic data order (loader state
restore + (seed, epoch) shuffle streams) and the same augmentation/dropout
draws (aug keys fold in the global step; the dropout stream continues from
the checkpointed state.rng). Validation sweeps do not touch train state,
so skipping them preserves the trajectory. The replay therefore reproduces
the production run step-for-step; a SEPARATE read-only jitted diagnostics
pass runs on each (state, batch) BEFORE the update and logs:

* every loss component for both criteria (class / bbox-L1 / CIoU);
* pre-clip global gradient norm, plus per-top-level-module grad norms
  (backbone / encoder / decoder / mini-detector / heads) to localize;
* the POST-optimizer update norm (global + per-module) — through the real
  ``tx`` (clip -> AdamW -> apply_if_finite), so a gradient spike that the
  clip absorbs is distinguishable from Adam amplifying a direction change;
* grad-, update- and param-finiteness flags;
* matched-GT and predicted-box degeneracy stats (min/mean areas, extreme
  h/w) — the degenerate-box / CIoU-blowup hypotheses;
* the dataset indices that formed the batch (recomputed from the loader's
  deterministic shuffle), so culprit batches can be re-examined.

IMPORTANT: pass the production run's EXACT data flags — in particular
``--augment_factor 1`` (the parser default is 5; a mismatch silently
changes the epoch length and shuffle stream, feeding different batches).
The tool prints steps/epoch at startup — check it against the production
run's epoch stride before trusting a trace.

Usage (the r4/r5 production recipe)::

    python tools/postmortem_divergence.py \
        --dataset synthetic --synthetic_size 672 \
        --num_train_samples 2048 --num_valid_samples 256 --augment_factor 1 \
        --image_size 640 --batch_size 16 --compute_dtype bfloat16 \
        --num_encoder_blocks 6 --num_decoder_blocks 6 --top_k 300 \
        --lr 1e-4 --lr_backbone 1e-4 --lr_drop 90 --lr_warmup_steps 1000 \
        --class_norm boxes --set_cost_class 1 --set_cost_bbox 2.5 \
        --set_cost_ciou 1 --grad_clip_norm 0.1 --skip_nonfinite 100 \
        --device_cache --checkpoint_dir checkpoints_prod \
        --resume --resume_from prod_r5 \
        --steps 520 --out /tmp/postmortem.jsonl

Writes one JSON line per step; stops ``--stop-after`` steps after the
first non-finite gradient (default 8) so the trace brackets the event.
``--f32`` reruns the window in float32 compute (bf16-range hypothesis
test; the trajectory then deliberately differs from production).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import object_detection_destr_tpu as _pkg

_pkg.enable_persistent_jit_cache()

from object_detection_destr_tpu.geometry.boxes import xyxy_to_cxcyhw
from object_detection_destr_tpu.losses.criterion import set_criterion
from object_detection_destr_tpu.models.destr.model import build_destr
from object_detection_destr_tpu.parallel.mesh import (
    auto_mesh,
    replicated_sharding,
)
from object_detection_destr_tpu.train.arg_parser import config_from_args, get_parser
from object_detection_destr_tpu.train.checkpoint import restore_checkpoint
from object_detection_destr_tpu.train.driver import _device_batch, _make_loaders
from object_detection_destr_tpu.train.state import create_destr_state
from object_detection_destr_tpu.train.steps import (
    _match_pair,
    _weighted,
    make_destr_train_step,
)
from object_detection_destr_tpu.data.transforms import destr_train_transform


def make_diagnostics_fn(model, tx, cfg):
    """Read-only per-step diagnostics on the PRE-update (state, batch).

    Recomputes the step's loss/grads (same inputs as the real step: the
    dropout key is re-derived from state.rng exactly as the 1-device step
    does) and pushes the grads through the real optimizer chain to get the
    update that is about to land. Never mutates or donates anything."""

    def loss_fn(params, batch_stats, rng, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        (model_out, det_out), _ = model.apply(
            variables, batch["images"],
            valid_mask=batch.get("pixel_valid"), train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        targets = {
            "boxes": batch["boxes"], "labels": batch["labels"],
            "valid": batch["valid"],
        }
        rows_model, rows_det = _match_pair(model_out, det_out, targets)
        l_model = set_criterion(model_out, targets, rows=rows_model,
                                class_norm=cfg.class_norm)
        l_det = set_criterion(det_out, targets, rows=rows_det,
                              class_norm=cfg.class_norm)
        loss_model = _weighted(l_model, cfg)
        loss_det = _weighted(l_det, cfg)
        loss = cfg.model_loss_weight * loss_model + cfg.det_loss_weight * loss_det
        # target-box degeneracy (normalized cxcyhw h*w areas over valid GTs)
        wh = xyxy_to_cxcyhw(targets["boxes"])[..., 2:]
        area = jnp.where(targets["valid"], wh[..., 0] * wh[..., 1], jnp.nan)
        # predicted-box degeneracy over the model's top_k queries (cxcyhw)
        phw = model_out["pred_boxes"][..., 2:].astype(jnp.float32)
        parea = phw[..., 0] * phw[..., 1]
        diag = {
            "m_class": l_model["class"], "m_bbox": l_model["bbox"],
            "m_ciou": l_model["ciou"],
            "d_class": l_det["class"], "d_bbox": l_det["bbox"],
            "d_ciou": l_det["ciou"],
            "loss": loss, "loss_model": loss_model, "loss_det": loss_det,
            "min_gt_area": jnp.nanmin(area),
            "mean_gt_area": jnp.nanmean(area),
            "n_gt": jnp.sum(targets["valid"]),
            "max_abs_logit": jnp.max(jnp.abs(model_out["pred_class"])),
            "min_pred_area": jnp.min(parea),
            "max_pred_hw": jnp.max(phw),
            "min_pred_hw": jnp.min(phw),
        }
        return loss, diag

    def _tree_norm(t):
        return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                            for x in jax.tree.leaves(t)))

    def diagnostics(state, batch):
        # same key derivation as the 1-device train step (steps.py:189)
        _, step_rng = jax.random.split(state.rng)
        grads, diag = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, step_rng, batch
        )
        gleaves = jax.tree.leaves(grads)
        diag["grad_norm"] = _tree_norm(grads)
        diag["grad_finite"] = jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(g)) for g in gleaves])
        )
        for k, v in grads.items():
            diag[f"g_{k}"] = _tree_norm(v)
        # the update that is about to land: through the REAL tx
        # (clip -> AdamW(schedule) -> apply_if_finite)
        upd, _ = tx.update(grads, state.opt_state, state.params)
        uleaves = jax.tree.leaves(upd)
        diag["update_norm"] = _tree_norm(upd)
        diag["update_finite"] = jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(u)) for u in uleaves])
        )
        for k, v in upd.items():
            diag[f"u_{k}"] = _tree_norm(v)
        diag["params_finite"] = jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(p))
                       for p in jax.tree.leaves(state.params)])
        )
        return diag

    return jax.jit(diagnostics)


def main(argv=None):
    parser = get_parser("destr")
    parser.add_argument("--steps", type=int, default=520)
    parser.add_argument("--stop-after", type=int, default=8,
                        help="extra steps to trace past the first "
                             "non-finite gradient")
    parser.add_argument("--out", default="/tmp/postmortem.jsonl")
    parser.add_argument("--f32", action="store_true",
                        help="replay in float32 compute (bf16-range "
                             "hypothesis test)")
    args = parser.parse_args(argv)
    config = config_from_args(args, "destr")
    if args.f32:
        config = dataclasses.replace(
            config, destr=dataclasses.replace(config.destr,
                                              compute_dtype="float32")
        )
    cfg_t = config.train

    mesh = auto_mesh(cfg_t.batch_size)
    canvas = int(cfg_t.image_size * 672 / 640)
    train_loader, _ = _make_loaders(config, canvas, "destr", mesh=mesh)
    base_loader = train_loader  # keep a handle for order reconstruction
    if config.data.device_cache:
        from object_detection_destr_tpu.data.device_cache import DeviceCachedLoader

        train_loader = DeviceCachedLoader(train_loader, mesh)

    model = build_destr(config.destr)
    state, tx = create_destr_state(
        model, cfg_t, image_size=cfg_t.image_size,
        steps_per_epoch=len(base_loader),
    )
    restored = restore_checkpoint(cfg_t.checkpoint_dir, cfg_t.resume_from, state)
    state = restored["state"]
    train_loader.load_state_dict(restored["loader"])
    state = jax.device_put(state, replicated_sharding(mesh))

    # the REAL production step: on a 1-device mesh the driver passes
    # step_mesh=None (driver.py:204), i.e. plain jit with state donation
    step_mesh = mesh if mesh.shape["data"] > 1 else None
    real_step = make_destr_train_step(model, tx, cfg_t, mesh=step_mesh)
    diag_fn = make_diagnostics_fn(model, tx, cfg_t)

    aug_rng = jax.random.key(cfg_t.seed + 7)
    out_size = cfg_t.image_size
    train_tf = lambda im, bx, lb, vd, key, content=None: destr_train_transform(
        im, bx, lb, vd, key, content, out_size=out_size
    )

    host_step = int(jax.device_get(state.step))
    print(f"restored at step {host_step}; tracing {args.steps} steps "
          f"(compute={config.destr.compute_dtype}); "
          f"steps/epoch={len(train_loader)} "
          f"(MUST match the production run's epoch stride)", flush=True)

    # reconstruct the deterministic per-epoch shuffle so each row records
    # which dataset items formed its batch (loader.py: rng((seed, epoch)))
    def epoch_order(epoch):
        n = len(base_loader.dataset) * base_loader.augment_factor
        order = np.arange(n)
        if base_loader.shuffle:
            np.random.default_rng((base_loader.seed, epoch)).shuffle(order)
        return order

    done = 0
    nonfinite_seen = None
    with open(args.out, "w") as f:
        while done < args.steps:
            loader_state = train_loader.state_dict()
            epoch = loader_state["epoch"]
            start0 = loader_state["step"]  # nonzero on a mid-epoch resume
            order = epoch_order(epoch)
            for step_in_epoch, raw in enumerate(train_loader, start=start0):
                step_key = jax.random.fold_in(aug_rng, host_step)
                batch = _device_batch(raw, train_tf, mesh, step_key)
                diag = diag_fn(state, batch)  # read-only, pre-update
                state, _ = real_step(state, batch)  # the bit-exact update
                fetched = jax.device_get(diag)
                b0 = step_in_epoch * cfg_t.batch_size
                idx = order[b0 : b0 + cfg_t.batch_size] % len(base_loader.dataset)
                row = {"step": host_step, "epoch": int(epoch),
                       "batch_indices": idx.tolist()}
                row.update({k: float(v) for k, v in fetched.items()})
                f.write(json.dumps(row) + "\n")
                f.flush()
                host_step += 1
                done += 1
                if not bool(fetched["grad_finite"]) and nonfinite_seen is None:
                    nonfinite_seen = host_step - 1
                    print(f"FIRST NON-FINITE GRAD at step {nonfinite_seen}; "
                          f"tracing {args.stop_after} more", flush=True)
                if nonfinite_seen is not None and (
                        host_step - 1 - nonfinite_seen >= args.stop_after):
                    done = args.steps
                if done >= args.steps:
                    break

    print(f"wrote {args.out}; first non-finite grad: {nonfinite_seen}",
          flush=True)


if __name__ == "__main__":
    main()
