"""Jit-compiled train/eval steps.

One fused step per model: forward, on-device matching, losses, backward,
optimizer update — no host syncs. Contrast with the reference hot loop which
leaves the device four times per step (scipy matcher, per-loss ``.item()``,
top-k Python loop, pair-gather loops — SURVEY.md §3.1).

Loss wiring mirrors train.py:160-217:
    weighted = cost_class * class + cost_bbox * bbox + cost_ciou * ciou
    total = 0.7 * weighted(model_out) + 0.3 * weighted(mini_detector_out)
and train_ssd.py:108-134 for SSD.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SSDConfig, TrainConfig
from ..geometry.boxes import default_boxes
from ..losses.criterion import set_criterion, ssd_criterion
from ..losses.matcher import hungarian_cost_matrix
from ..ops.assignment import batched_assignment
from .state import TrainState

# Mesh-aware steps (VERDICT r2 #3): when a ``mesh`` is passed, the step body
# runs under ``shard_map`` over the 'data' axis — every operand the Pallas
# kernels (fused matcher, flash attention) see is the LOCAL batch shard, so a
# real multi-chip mesh partitions them by construction instead of XLA
# replicating/all-gathering a kernel it has no partitioning rule for. The
# only collectives in the step are the gradient psum, the criterion's
# global-batch reductions, and the mini-detector BN pmean (flax axis_name) —
# all riding ICI. Losses/grads equal the single-device global-batch math
# exactly (see set_criterion(axis_name=...)).


def _axis_of(mesh: Optional[Mesh]) -> Optional[str]:
    return "data" if mesh is not None else None


def _wrap_step(core, mesh: Optional[Mesh], out_specs, donate: bool):
    """jit(core) without a mesh; jit(shard_map(core)) over ('data',) with one.

    in_specs: state replicated, batch sharded on the leading axis.
    """
    if mesh is None:
        return (
            jax.jit(core, donate_argnums=(0,)) if donate else jax.jit(core)
        )
    from jax.experimental.shard_map import shard_map

    smapped = shard_map(
        core, mesh=mesh, in_specs=(P(), P("data")), out_specs=out_specs,
        check_rep=False,
    )
    return (
        jax.jit(smapped, donate_argnums=(0,)) if donate else jax.jit(smapped)
    )

__all__ = [
    "make_destr_train_step",
    "make_destr_eval_step",
    "make_ssd_train_step",
    "make_ssd_eval_step",
    "flat_anchors",
]


def _weighted(losses: dict, cfg: TrainConfig) -> jnp.ndarray:
    """reduce_dict with the --set_cost_* weights (train.py:33-37, 172-175)."""
    return (
        cfg.set_cost_class * losses["class"]
        + cfg.set_cost_bbox * losses["bbox"]
        + cfg.set_cost_ciou * losses["ciou"]
    )


def _destr_targets(batch: dict) -> dict:
    return {"boxes": batch["boxes"], "labels": batch["labels"], "valid": batch["valid"]}


def _match_pair(model_out: dict, det_out: dict, targets: dict):
    """Matching for both criteria (model top_k queries; mini-detector HW
    tokens).

    On TPU each solve is one fused Pallas launch: the focal+CIoU cost is
    built in VMEM feeding the auction directly — the XLA cost matrix alone
    measured ~4.5 ms/step at b8 because its (B, N, T) layout puts T=32 on
    the 128-lane minor dim (BASELINE.md r2 profile). Elsewhere the XLA
    reference path runs (cost matrices stacked into one (2B, max_N, T)
    solve to amortize the while_loop overhead).

    stop_gradient sits on the matcher INPUTS, not just the result: the
    matcher is non-differentiable by construction (reference uses
    @torch.no_grad, matcher.py:158), and zeroing tangents keeps autodiff
    from trying to linearize through the Pallas kernels (no JVP rule).
    """
    import os

    sg = jax.lax.stop_gradient
    use_pallas = jax.default_backend() == "tpu" and not os.environ.get(
        "OBJDET_NO_PALLAS_MATCHER"
    )
    # OBJDET_FORCE_PALLAS_MATCHER=1 routes the fused kernel on any platform
    # (interpret mode off-TPU) — the multi-chip dry run uses it so the gate
    # exercises the kernel path TPU actually runs (VERDICT r2 #4)
    use_pallas = use_pallas or bool(os.environ.get("OBJDET_FORCE_PALLAS_MATCHER"))
    if use_pallas:
        from ..ops.pallas.auction import hungarian_match_pallas

        tb, tl, tv = sg(targets["boxes"]), targets["labels"], targets["valid"]
        # ONE kernel launch for both problems: the model's top_k queries and
        # the mini-detector's HW tokens are padded to a common row count,
        # stacked on batch, and separated by a per-problem row-valid mask
        # (the second launch alone measured ~0.8 ms/step in the r3 profile)
        b = model_out["pred_class"].shape[0]
        n1 = model_out["pred_class"].shape[1]
        n2 = det_out["pred_class"].shape[1]
        n = max(n1, n2)
        pad_n = lambda x, nn_: jnp.pad(x, ((0, 0), (0, n - nn_)) + ((0, 0),) * (x.ndim - 2))
        logits = jnp.concatenate(
            [pad_n(sg(model_out["pred_class"]), n1), pad_n(sg(det_out["pred_class"]), n2)], 0
        )
        boxes = jnp.concatenate(
            [pad_n(sg(model_out["pred_boxes"]), n1), pad_n(sg(det_out["pred_boxes"]), n2)], 0
        )
        iota_n = jnp.arange(n)[None, :]
        rowv = jnp.concatenate(
            [jnp.broadcast_to(iota_n < n1, (b, n)), jnp.broadcast_to(iota_n < n2, (b, n))], 0
        )
        rows = hungarian_match_pallas(
            logits, boxes,
            jnp.concatenate([tb, tb], 0), jnp.concatenate([tl, tl], 0),
            jnp.concatenate([tv, tv], 0), row_valid=rowv,
        )
        return rows[:b], rows[b:]

    c1 = hungarian_cost_matrix(model_out, targets)  # (B, N1, T)
    c2 = hungarian_cost_matrix(det_out, targets)  # (B, N2, T)
    n = max(c1.shape[1], c2.shape[1])
    pad = lambda c: jnp.pad(
        c, ((0, 0), (0, n - c.shape[1]), (0, 0)), constant_values=1e6
    )
    cost = jnp.concatenate([pad(c1), pad(c2)], axis=0)
    valid2 = jnp.concatenate([targets["valid"]] * 2, axis=0)
    rows = batched_assignment(sg(cost), valid2)
    b = c1.shape[0]
    return rows[:b], rows[b:]


def make_destr_train_step(
    model, tx, cfg: TrainConfig, mesh: Optional[Mesh] = None, wrap: bool = True
) -> Callable:
    """``wrap=False`` returns the raw step body (collectives included when a
    mesh is given) for embedding in a larger program — the scanned-epoch
    runner (train/epoch_scan.py) jits/shard_maps the WHOLE epoch instead."""
    axis = _axis_of(mesh)

    def loss_fn(params, batch_stats, rng, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        (model_out, det_out), mutated = model.apply(
            variables,
            batch["images"],
            valid_mask=batch.get("pixel_valid"),  # letterbox padding mask
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        targets = _destr_targets(batch)
        rows_model, rows_det = _match_pair(model_out, det_out, targets)
        l_model = set_criterion(model_out, targets, rows=rows_model, axis_name=axis,
                                class_norm=cfg.class_norm)
        l_det = set_criterion(det_out, targets, rows=rows_det, axis_name=axis,
                              class_norm=cfg.class_norm)
        loss_model = _weighted(l_model, cfg)
        loss_det = _weighted(l_det, cfg)
        loss = cfg.model_loss_weight * loss_model + cfg.det_loss_weight * loss_det
        metrics = {
            "loss": loss,
            "loss_model": loss_model,
            "loss_det": loss_det,
            "loss_class": l_model["class"],
            "loss_ciou": l_model["ciou"],
        }
        return loss, (mutated.get("batch_stats", batch_stats), metrics)

    def train_step(state: TrainState, batch: dict):
        rng, step_rng = jax.random.split(state.rng)
        if axis is not None:
            # distinct dropout draws per shard; state rng stays replicated
            step_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(axis))
        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, step_rng, batch
        )
        if axis is not None:
            # the loss is already the GLOBAL-batch loss (criterion psums), so
            # each shard's grad is its data's contribution — psum completes it
            grads = jax.lax.psum(grads, axis)
        new_stats = _guard_stats(new_stats, state.batch_stats, cfg)
        new_state = state.apply_gradients(grads, tx, batch_stats=new_stats, rng=rng)
        return new_state, metrics

    if not wrap:
        return train_step
    return _wrap_step(train_step, mesh, out_specs=(P(), P()), donate=True)


def _guard_stats(new_stats, old_stats, cfg: TrainConfig):
    """Keep BN running stats finite when non-finite protection is on.

    ``optax.apply_if_finite`` shields params, but batch_stats mutate in the
    forward pass — one NaN activation would poison the running mean/var for
    the rest of the run (observed in the r4 production runs: every epoch
    after a single NaN step evaluated as NaN)."""
    if not getattr(cfg, "skip_nonfinite_updates", 0):
        return new_stats
    return jax.tree.map(
        lambda n, o: jnp.where(jnp.isfinite(n), n, o), new_stats, old_stats
    )


def make_destr_eval_step(
    model, cfg: TrainConfig, mesh: Optional[Mesh] = None
) -> Callable:
    axis = _axis_of(mesh)

    def eval_step(state: TrainState, batch: dict):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        model_out, det_out = model.apply(
            variables, batch["images"],
            valid_mask=batch.get("pixel_valid"), train=False,
        )
        targets = _destr_targets(batch)
        rows_model, rows_det = _match_pair(model_out, det_out, targets)
        l_model = set_criterion(model_out, targets, rows=rows_model, axis_name=axis,
                                class_norm=cfg.class_norm)
        l_det = set_criterion(det_out, targets, rows=rows_det, axis_name=axis,
                              class_norm=cfg.class_norm)
        metrics = {
            "loss_model": _weighted(l_model, cfg),
            "loss_det": _weighted(l_det, cfg),
            "loss_class": l_model["class"],
            "loss_ciou": l_model["ciou"],
        }
        return model_out, metrics

    # model_out reassembles across shards (P('data')); metrics are global
    return _wrap_step(eval_step, mesh, out_specs=(P("data"), P()), donate=False)


def flat_anchors(ssd_cfg: SSDConfig) -> jnp.ndarray:
    """(S, 4) default boxes flattened scale-major, matching the criterion's
    flatten order (criterion.py:243-247)."""
    per_scale = default_boxes(
        ssd_cfg.feature_shapes, ssd_cfg.scales, ssd_cfg.aspect_ratios
    )
    return jnp.concatenate([a.reshape(-1, 4) for a in per_scale], axis=0)


def make_ssd_train_step(
    model, tx, cfg: TrainConfig, ssd_cfg: SSDConfig,
    mesh: Optional[Mesh] = None, wrap: bool = True,
) -> Callable:
    """``wrap=False``: raw step body for the scanned-epoch runner (see
    make_destr_train_step)."""
    anchors = flat_anchors(ssd_cfg)
    axis = _axis_of(mesh)

    def loss_fn(params, batch_stats, rng, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        outputs, mutated = model.apply(
            variables,
            batch["images"],
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        targets = _destr_targets(batch)  # boxes already cxcyhw for SSD
        losses = ssd_criterion(outputs, targets, anchors, loss_coef=cfg.coef_class_loss,
                               mining=ssd_cfg.hard_neg_mining)
        return losses["loss"], (mutated.get("batch_stats", batch_stats), losses)

    def train_step(state: TrainState, batch: dict):
        rng, step_rng = jax.random.split(state.rng)
        if axis is not None:
            step_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(axis))
        grads, (new_stats, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, step_rng, batch
        )
        if axis is not None:
            # SSD losses are per-image means, so the global loss is the pmean
            # of equal-size shard means — classic DP reduction
            grads = jax.lax.pmean(grads, axis)
            metrics = jax.lax.pmean(metrics, axis)
        new_stats = _guard_stats(new_stats, state.batch_stats, cfg)
        new_state = state.apply_gradients(grads, tx, batch_stats=new_stats, rng=rng)
        return new_state, metrics

    if not wrap:
        return train_step
    return _wrap_step(train_step, mesh, out_specs=(P(), P()), donate=True)


def make_ssd_eval_step(
    model, cfg: TrainConfig, ssd_cfg: SSDConfig, mesh: Optional[Mesh] = None
) -> Callable:
    from ..losses.matcher import decode_ssd_boxes

    anchors = flat_anchors(ssd_cfg)
    axis = _axis_of(mesh)

    def eval_step(state: TrainState, batch: dict):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        outputs = model.apply(variables, batch["images"], train=False)
        targets = _destr_targets(batch)
        losses = ssd_criterion(outputs, targets, anchors, loss_coef=cfg.coef_class_loss,
                               mining=ssd_cfg.hard_neg_mining)
        # decoded detections in the metric's contract ({"pred_class" logits,
        # "pred_boxes" cxcyhw}) — the reference builds the SSD metric but
        # leaves it commented out (train_ssd.py:71-74); here it's wired
        flat = lambda seq: jnp.concatenate(
            [t.reshape(t.shape[0], -1, t.shape[-1]) for t in seq], axis=1
        )
        detections = {
            "pred_class": flat(outputs["conf"]),
            "pred_boxes": decode_ssd_boxes(flat(outputs["boxes"]), anchors),
        }
        if axis is not None:
            losses = jax.lax.pmean(losses, axis)
        return outputs, losses, detections

    # per-shard outputs/detections reassemble on 'data'; losses are global
    return _wrap_step(
        eval_step, mesh, out_specs=(P("data"), P(), P("data")), donate=False
    )
