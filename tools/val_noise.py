"""Quantify val-mAP snapshot noise for a FIXED checkpoint (VERDICT r4 #5).

The r4 production curve oscillates 0.27-0.53 between adjacent epochs on a
256-image synthetic val set. Two candidate explanations:

* **metric/protocol variance** — val-loader shuffle order, batch
  composition, or sampling noise of the small val set;
* **model oscillation** — the params genuinely move that much per epoch.

This tool separates them for one checkpoint:

1. runs the full val sweep under ``--orders N`` different val-loader
   shuffle seeds and checks the accumulated metric state is IDENTICAL —
   the reference metric sums per-image rank histograms
   (losses/metrics.py), so image order cannot matter; this measures that
   claim end-to-end through the real loader/transform/forward;
2. collects PER-IMAGE metric records (ref-metric tp/fp rank rows, COCO
   detection records), verifies their sum reproduces the sweep metric
   exactly, then **bootstrap-resamples the image set** ``--bootstrap K``
   times to get the sampling-error bars of the 256-image protocol.

Whatever spread the bootstrap shows is metric noise from val-set size;
anything beyond it in the epoch-to-epoch curve is the model moving.

Usage (same flags as the trainer, plus the two knobs)::

    python tools/val_noise.py --resume_from prod_r4b \
        --checkpoint_dir checkpoints_prod --dataset synthetic \
        --synthetic_size 672 --num_valid_samples 256 --image_size 640 \
        --batch_size 16 --compute_dtype bfloat16 --top_k 300 \
        --num_encoder_blocks 6 --num_decoder_blocks 6 \
        --bootstrap 1000 --orders 3

Prints one JSON line; commit it under artifacts/.
"""

from __future__ import annotations

import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import object_detection_destr_tpu as _pkg

_pkg.enable_persistent_jit_cache()

from object_detection_destr_tpu.data.transforms import destr_eval_transform
from object_detection_destr_tpu.losses.metrics import (
    CocoAveragePrecision,
    MeanAveragePrecision,
    _coco_batch_records,
)
from object_detection_destr_tpu.models.destr.model import build_destr
from object_detection_destr_tpu.parallel.mesh import auto_mesh, shard_batch
from object_detection_destr_tpu.train.arg_parser import config_from_args, get_parser
from object_detection_destr_tpu.train.checkpoint import restore_for_inference
from object_detection_destr_tpu.train.driver import _make_loaders


def _sweep(config, variables, model, loader_seed: int, collect_per_image: bool):
    """One full val sweep. Returns (metric_state_np, coco_records,
    per_image_records or None)."""
    import dataclasses

    cfg_t = config.train
    mesh = auto_mesh(cfg_t.batch_size)
    canvas = int(cfg_t.image_size * 672 / 640)
    cfg = dataclasses.replace(
        config, train=dataclasses.replace(cfg_t, seed=cfg_t.seed)
    )
    _, valid_loader = _make_loaders(cfg, canvas, "destr", mesh=mesh)
    # re-seed ONLY the loader order; the dataset itself keeps config.seed
    valid_loader.seed = loader_seed
    if hasattr(valid_loader, "_rng"):
        valid_loader._rng = np.random.default_rng(loader_seed)

    @jax.jit
    def fwd(variables, images, pixel_valid):
        model_out, _ = model.apply(
            variables, images, valid_mask=pixel_valid, train=False
        )
        return model_out

    metric = MeanAveragePrecision(num_cls=1, num_pred=config.destr.top_k)
    m_state = metric.init_state()
    coco = CocoAveragePrecision(num_cls=max(config.destr.num_cls - 1, 1))
    per_image = {"tp": [], "fp": [], "n_gt": [], "coco_scores": [],
                 "coco_tp": [], "coco_ngt": []} if collect_per_image else None

    out_size = cfg_t.image_size
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
        targets = {"boxes": batch["boxes"], "labels": batch["labels"],
                   "valid": batch["valid"]}
        m_state = metric.update(m_state, outputs, targets)
        coco.update(outputs, targets)
        if per_image is not None:
            # per-image ref-metric rows: feed each image as a batch of one
            # through the SAME jitted update the sweep metric uses (no
            # reimplementation to drift); B=1 compiles once.
            out_np = jax.device_get(outputs)
            tgt_np = jax.device_get(targets)
            B = out_np["pred_class"].shape[0]
            for i in range(B):
                s1 = metric.update(
                    metric.init_state(),
                    {k: v[i : i + 1] for k, v in out_np.items()
                     if k in ("pred_class", "pred_boxes")},
                    {k: v[i : i + 1] for k, v in tgt_np.items()},
                )
                s1 = jax.device_get(s1)
                per_image["tp"].append(np.asarray(s1["tp"][0]))
                per_image["fp"].append(np.asarray(s1["fp"][0]))
                per_image["n_gt"].append(int(s1["num_gts"][0]))
            # COCO records are already per-image
            sc, tp, ng = jax.device_get(
                _coco_batch_records(
                    outputs, targets, num_cls=coco.num_cls,
                    max_dets=coco.max_dets, iou_thresholds=coco.IOU_THRESHOLDS,
                )
            )
            per_image["coco_scores"].append(np.asarray(sc))
            per_image["coco_tp"].append(np.asarray(tp))
            per_image["coco_ngt"].append(np.asarray(ng))

    return jax.device_get(m_state), coco, per_image, metric


def _ref_ap_from_rows(tp_rows, fp_rows, n_gts, metric):
    state = {
        "tp": np.sum(tp_rows, axis=0, keepdims=True),
        "fp": np.sum(fp_rows, axis=0, keepdims=True),
        "num_gts": np.asarray([int(np.sum(n_gts))]),
    }
    return metric.compute(state)


def _coco_ap_from_records(scores, tp, ngt, template: CocoAveragePrecision):
    c = CocoAveragePrecision(num_cls=template.num_cls,
                             max_dets_per_image=template.max_dets)
    c._scores = [scores]
    c._tp = [tp]
    c._num_gts = ngt.sum(axis=0).astype(np.int64)
    return c.compute()


def main(argv=None):
    parser = get_parser("destr")
    parser.add_argument("--bootstrap", type=int, default=1000)
    parser.add_argument("--orders", type=int, default=3)
    args = parser.parse_args(argv)
    config = config_from_args(args, "destr")

    model = build_destr(config.destr)
    variables = restore_for_inference(
        config.train.checkpoint_dir, args.resume_from
    )

    # --- order-invariance: N sweeps under different loader shuffle seeds
    states = []
    per_image = None
    metric = None
    coco0 = None
    for k in range(max(args.orders, 1)):
        st, coco, pi, metric = _sweep(
            config, variables, model, loader_seed=1000 + 17 * k,
            collect_per_image=(k == 0),
        )
        states.append(st)
        if k == 0:
            per_image, coco0 = pi, coco
    order_same = all(
        np.array_equal(np.asarray(s["tp"]), np.asarray(states[0]["tp"]))
        and np.array_equal(np.asarray(s["fp"]), np.asarray(states[0]["fp"]))
        and np.array_equal(np.asarray(s["num_gts"]), np.asarray(states[0]["num_gts"]))
        for s in states[1:]
    )

    point_map = metric.compute(states[0])
    point_coco = coco0.compute()

    # --- per-image records must reproduce the sweep metric exactly
    tp_rows = np.stack(per_image["tp"])  # (n_img, num_pred)
    fp_rows = np.stack(per_image["fp"])
    n_gts = np.asarray(per_image["n_gt"])
    map_from_rows = _ref_ap_from_rows(tp_rows, fp_rows, n_gts, metric)
    rows_exact = abs(map_from_rows - point_map) < 1e-9

    co_scores = np.concatenate(per_image["coco_scores"], axis=0)  # (n_img, C, K)
    co_tp = np.concatenate(per_image["coco_tp"], axis=0)
    co_ngt = np.concatenate(per_image["coco_ngt"], axis=0)  # (n_img, C)
    coco_from_rows = _coco_ap_from_records(co_scores, co_tp, co_ngt, coco0)
    coco_exact = abs(coco_from_rows - point_coco) < 1e-9

    # --- bootstrap over images
    n_img = tp_rows.shape[0]
    rng = np.random.default_rng(0)
    maps, cocos = [], []
    for _ in range(args.bootstrap):
        idx = rng.integers(0, n_img, size=n_img)
        maps.append(_ref_ap_from_rows(tp_rows[idx], fp_rows[idx], n_gts[idx], metric))
        cocos.append(
            _coco_ap_from_records(co_scores[idx], co_tp[idx], co_ngt[idx], coco0)
        )
    maps, cocos = np.asarray(maps), np.asarray(cocos)

    def stats(a):
        return {
            "mean": float(a.mean()), "std": float(a.std()),
            "p2.5": float(np.percentile(a, 2.5)),
            "p97.5": float(np.percentile(a, 97.5)),
        }

    result = {
        "checkpoint": args.resume_from,
        "n_images": int(n_img),
        "orders_tested": int(args.orders),
        "order_invariant": bool(order_same),
        "per_image_rows_reproduce_sweep": bool(rows_exact and coco_exact),
        "map_point": round(point_map, 5),
        "coco_point": round(point_coco, 5),
        "bootstrap_K": int(args.bootstrap),
        "map_bootstrap": {k: round(v, 5) for k, v in stats(maps).items()},
        "coco_bootstrap": {k: round(v, 5) for k, v in stats(cocos).items()},
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
