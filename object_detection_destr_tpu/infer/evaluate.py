"""Standalone DESTR evaluation CLI.

The reference has no eval entry point at all — validation exists only inside
the train loop (src/train/train.py:59-119) and the orphan NMS module's
``__main__`` smoke block (SURVEY.md §3.5). This module evaluates any saved
checkpoint against a dataset split without training: both metrics
(reference 11-point mAP and COCO-AP) plus prediction *diagnostics* that
separate the three ways a detector can score zero —

* classification confidence (does any query become argmax-foreground, the
  reference metric's selection rule, criterion.py:160-174),
* score ranking (do sigmoid scores order objects above clutter — what
  COCO-AP measures),
* localization ceiling (for each GT, the best IoU over ALL predictions —
  if this is low, no amount of confidence can match at IoU >= 0.5).

Usage (same flags as the trainer, geometry included)::

    python -m object_detection_destr_tpu.infer.evaluate \
        --resume_from prod_r4_last --checkpoint_dir checkpoints_prod \
        --dataset synthetic --synthetic_size 672 --num_valid_samples 256 \
        --image_size 640 --batch_size 8 --top_k 300 [--no-letterbox_eval]

Prints one JSON line with metrics + diagnostics.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.boxes import cxcyhw_to_xyxy, pairwise_iou
from ..losses.metrics import CocoAveragePrecision, MeanAveragePrecision
from ..models.destr.model import build_destr
from ..train.arg_parser import config_from_args, get_parser
from ..train.checkpoint import restore_for_inference

__all__ = ["evaluate_destr", "main"]


def _batch_diagnostics(outputs: dict, targets: dict) -> dict:
    """Host-side per-batch prediction stats (tiny arrays, numpy)."""
    logits = np.asarray(outputs["pred_class"], np.float32)  # (B, N, C)
    pred_xyxy = np.asarray(cxcyhw_to_xyxy(outputs["pred_boxes"]), np.float32)
    gt = np.asarray(targets["boxes"], np.float32)
    gt_valid = np.asarray(targets["valid"], bool)

    sig0 = 1.0 / (1.0 + np.exp(-logits[..., 0]))  # (B, N) class-0 sigmoid
    argmax0 = logits.argmax(-1) == 0  # reference-metric selection rule

    iou = np.asarray(pairwise_iou(jnp.asarray(pred_xyxy), jnp.asarray(gt)))
    best_iou_per_gt = iou.max(axis=1)  # (B, T)
    # IoU of the top-scoring prediction against its best-overlapping valid
    # GT, per image (what a confident-but-misplaced model would fail);
    # aggregated over images WITH at least one GT, not over GTs — summing
    # over all GTs diluted the value ~n_gt-fold on multi-GT images
    top_pred = sig0.argmax(-1)  # (B,)
    top_iou = iou[np.arange(iou.shape[0]), top_pred]  # (B, T)
    img_has_gt = gt_valid.any(-1)  # (B,)
    top_iou_best = np.where(gt_valid, top_iou, -1.0).max(-1)  # (B,)

    sel = gt_valid
    return {
        "n_gt": int(sel.sum()),
        "sum_best_iou": float(best_iou_per_gt[sel].sum()),
        "n_gt_localized": int((best_iou_per_gt[sel] >= 0.5).sum()),
        "sum_top_iou": float(top_iou_best[img_has_gt].sum()),
        "n_img_with_gt": int(img_has_gt.sum()),
        "n_images": int(logits.shape[0]),
        "n_img_with_argmax0": int(argmax0.any(-1).sum()),
        "n_pred_argmax0": int(argmax0.sum()),
        "n_pred": int(argmax0.size),
        "sum_max_sig0": float(sig0.max(-1).sum()),
        "max_sig0": float(sig0.max()),  # aggregated as a max downstream
    }


def evaluate_destr(config, checkpoint_name: str) -> dict:
    """Run the full val sweep for ``checkpoint_name``; returns metric dict."""
    from ..parallel.mesh import auto_mesh, shard_batch
    from ..train.driver import _make_loaders
    from ..data.transforms import destr_eval_transform

    cfg_t = config.train
    mesh = auto_mesh(cfg_t.batch_size)
    canvas = int(cfg_t.image_size * 672 / 640)
    _, valid_loader = _make_loaders(config, canvas, "destr", mesh=mesh)

    model = build_destr(config.destr)
    variables = restore_for_inference(cfg_t.checkpoint_dir, checkpoint_name)

    @jax.jit
    def fwd(variables, images, pixel_valid):
        model_out, _ = model.apply(
            variables, images, valid_mask=pixel_valid, train=False
        )
        return model_out

    out_size = cfg_t.image_size
    metric = MeanAveragePrecision(num_cls=1, num_pred=config.destr.top_k)
    coco = CocoAveragePrecision(num_cls=max(config.destr.num_cls - 1, 1))
    m_state = metric.init_state()
    totals: dict = {}
    for raw in valid_loader:
        host = {k: raw[k] for k in ("images", "boxes", "labels", "valid")}
        if "content_hw" in raw:
            host["content_hw"] = raw["content_hw"]
        batch = shard_batch(host, mesh)
        batch = destr_eval_transform(
            batch["images"], batch["boxes"], batch["labels"], batch["valid"],
            batch.get("content_hw"), resize_to=canvas, out_size=out_size,
        )
        outputs = fwd(variables, batch["images"], batch.get("pixel_valid"))
        targets = {
            "boxes": batch["boxes"], "labels": batch["labels"],
            "valid": batch["valid"],
        }
        m_state = metric.update(m_state, outputs, targets)
        coco.update(outputs, targets)
        d = _batch_diagnostics(jax.device_get(outputs), jax.device_get(targets))
        for k, v in d.items():
            if k == "max_sig0":  # dataset max, not a sum
                totals[k] = max(totals.get(k, 0.0), v)
            else:
                totals[k] = totals.get(k, 0.0 if isinstance(v, float) else 0) + v

    if not totals:
        raise RuntimeError(
            "empty validation split: the loader yielded zero batches "
            f"(num_valid_samples={config.data.num_valid_samples}, "
            f"batch_size={cfg_t.batch_size})"
        )
    n_gt = max(totals.get("n_gt", 0), 1)
    n_img = max(totals.get("n_images", 0), 1)
    return {
        "checkpoint": checkpoint_name,
        "letterbox_eval": bool(config.train.letterbox_eval or config.train.letterbox),
        "map": metric.compute(m_state),
        "coco_map": coco.compute(),
        # localization ceiling: best-possible recall at IoU 0.5 over ALL preds
        "gt_localized_frac": totals.get("n_gt_localized", 0) / n_gt,
        "mean_best_iou_per_gt": totals.get("sum_best_iou", 0.0) / n_gt,
        # mean over images-with-GT of the top-scoring prediction's best IoU
        "mean_top_pred_iou": (
            totals.get("sum_top_iou", 0.0) / max(totals.get("n_img_with_gt", 0), 1)
        ),
        # reference-metric selection rule: argmax(softmax) == class 0
        "img_with_argmax_fg_frac": totals.get("n_img_with_argmax0", 0) / n_img,
        "pred_argmax_fg_frac": (
            totals.get("n_pred_argmax0", 0) / max(totals.get("n_pred", 0), 1)
        ),
        # score calibration
        "mean_image_max_score": totals.get("sum_max_sig0", 0.0) / n_img,
        "max_score": totals.get("max_sig0", 0.0),
        "n_gt": int(totals.get("n_gt", 0)),
        "n_images": int(totals.get("n_images", 0)),
    }


def evaluate_ssd(config, checkpoint_name: str) -> dict:
    """SSD counterpart of :func:`evaluate_destr` (same sweep the SSD
    driver's per-epoch validation runs, driver.py::train_ssd, standalone).

    Metrics: reference 11-point mAP over ``num_cls`` classes (the metric
    the reference constructs but leaves commented out,
    src/train/train_ssd.py:71-74) + localization diagnostics computed from
    the decoded detections (best IoU over all 8732 anchors per GT — the
    recall ceiling NMS/confidence can never exceed).
    """
    from ..data.transforms import ssd_eval_transform
    from ..models.ssd.model import build_ssd
    from ..parallel.mesh import auto_mesh
    from ..train.driver import _device_batch, _make_loaders
    from ..train.state import TrainState
    from ..train.steps import make_ssd_eval_step

    cfg_t = config.train
    mesh = auto_mesh(cfg_t.batch_size)
    canvas = int(config.ssd.image_size * 1.28)  # driver's patch headroom
    _, valid_loader = _make_loaders(config, canvas, "ssd", mesh=mesh)

    model = build_ssd(config.ssd)
    variables = restore_for_inference(cfg_t.checkpoint_dir, checkpoint_name)
    # eval_step only touches params/batch_stats; the rest are inert leaves
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=(),
        rng=jax.random.key(0),
    )
    eval_step = make_ssd_eval_step(model, cfg_t, config.ssd, mesh=None)

    out_size = config.ssd.image_size
    eval_tf = lambda im, bx, lb, vd: ssd_eval_transform(
        im, bx, lb, vd, out_size=out_size
    )
    metric = MeanAveragePrecision(num_cls=config.ssd.num_cls)
    m_state = metric.init_state()
    losses = []
    totals: dict = {}
    for raw in valid_loader:
        batch = _device_batch(raw, eval_tf, mesh)
        _, batch_losses, detections = eval_step(state, batch)
        losses.append(batch_losses)
        targets_xyxy = {
            "boxes": cxcyhw_to_xyxy(batch["boxes"]),
            "labels": batch["labels"],
            "valid": batch["valid"],
        }
        m_state = metric.update(m_state, detections, targets_xyxy)
        # localization ceiling over all anchors (host-side, tiny)
        pred_xyxy = np.asarray(
            cxcyhw_to_xyxy(detections["pred_boxes"]), np.float32
        )
        gt = np.asarray(targets_xyxy["boxes"], np.float32)
        gt_valid = np.asarray(batch["valid"], bool)
        iou = np.asarray(
            pairwise_iou(jnp.asarray(pred_xyxy), jnp.asarray(gt))
        ).max(axis=1)  # (B, T) best IoU per GT
        totals["n_gt"] = totals.get("n_gt", 0) + int(gt_valid.sum())
        totals["sum_best_iou"] = (
            totals.get("sum_best_iou", 0.0) + float(iou[gt_valid].sum())
        )
        totals["n_gt_localized"] = (
            totals.get("n_gt_localized", 0) + int((iou[gt_valid] >= 0.5).sum())
        )
        totals["n_images"] = totals.get("n_images", 0) + int(gt.shape[0])
    if not totals:
        raise RuntimeError(
            "empty validation split: the loader yielded zero batches "
            f"(num_valid_samples={config.data.num_valid_samples}, "
            f"batch_size={cfg_t.batch_size})"
        )
    fetched = jax.device_get(losses)
    n_gt = max(totals["n_gt"], 1)
    return {
        "checkpoint": checkpoint_name,
        "map": metric.compute(m_state),
        "val_loss": float(np.mean([f["loss"] for f in fetched])),
        "gt_localized_frac": totals["n_gt_localized"] / n_gt,
        "mean_best_iou_per_gt": totals["sum_best_iou"] / n_gt,
        "n_gt": int(totals["n_gt"]),
        "n_images": int(totals["n_images"]),
    }


def main(argv=None):
    import sys

    from .. import enable_persistent_jit_cache

    enable_persistent_jit_cache()
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    kind = "destr"
    if "--model" in argv:  # pre-parse: flag sets determined by the model
        i = argv.index("--model")
        kind = argv[i + 1]
        del argv[i : i + 2]
    parser = get_parser(kind)
    args = parser.parse_args(argv)
    config = config_from_args(args, kind)
    evaluate = evaluate_ssd if kind == "ssd" else evaluate_destr
    result = evaluate(config, args.resume_from)
    print(json.dumps({k: (round(v, 5) if isinstance(v, float) else v)
                      for k, v in result.items()}))
    return result


if __name__ == "__main__":
    main()
