"""Reference-vs-repo SSD accuracy A/B at miniature scale (companion to
tools/ab_reference.py; same shared-everything protocol).

Shared: synthetic multi-class dataset (identical pixels/targets), converted
initial weights (``ssd_variables_from_torch``), AdamW with the reference's
param groups, identical batch order. The reference trains through its own
``train_ssd.train_one_epoch`` + ``SimpleMatcher`` + ``SSDCriterion``.

One deliberate asymmetry, by documented design: the reference's class loss
only counts the LAST image of each batch (the loss statement sits outside
its per-image loop — criterion.py:334-335, REFCOMPAT #3); our criterion
counts every image. The A/B therefore measures each system's real training
behavior, not a bug-for-bug copy.

Scoring: both sides' raw pyramid outputs go through THIS repo's decode +
MeanAveragePrecision (the reference's SSD metric path is commented out,
train_ssd.py:71-74); the reference's dead confidence channel is dropped
(channels [0..C-1, C+1], criterion.py:324-328).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.ab_reference import (  # noqa: E402
    IMAGENET_MEAN,
    IMAGENET_STD,
    _Loader,
    epoch_orders,
    pad_targets,
)


def build_shared_data(n, image_size, max_boxes, num_classes, seed):
    from object_detection_destr_tpu.data.datasets import SyntheticDetection

    ds = SyntheticDetection(
        num_samples=n, image_size=image_size, max_boxes=max_boxes,
        num_classes=num_classes, seed=seed,
    )
    images, boxes, labels = [], [], []
    for i in range(n):
        img, bx, lb = ds[i]
        images.append((img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD)
        boxes.append(bx)
        labels.append(lb)
    return np.stack(images), boxes, labels


def _xyxy_to_cxcyhw(b):
    # h-before-w, the reference convention (bbox_utils.py:66-103)
    return np.stack(
        [(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2,
         b[:, 3] - b[:, 1], b[:, 2] - b[:, 0]], -1
    ).astype(np.float32)


def run_reference(args, images, box_list, label_list, orders, val_images):
    import torch

    from tools.ref_torch_models import (
        _ensure_reference_importable,
        build_reference_ssd,
    )

    _ensure_reference_importable()
    from src.train.train_ssd import train_one_epoch
    from src.utils.criterion import SSDClassCriterion, SSDCriterion, SSDLocalCriterion
    from src.utils.matcher import SimpleMatcher

    class A:
        num_cls = args.num_cls
        lr_backbone = args.lr_backbone
        resume = False
        device = "cpu"
        batch_size = args.batch
        scale_min = 0.2
        scale_max = 0.9
        coef_class_loss = 0.5

    torch.manual_seed(args.seed)
    model = build_reference_ssd(A())
    init_sd = {k: v.clone() for k, v in model.state_dict().items()}

    other = [p for n_, p in model.named_parameters() if "_backbone" not in n_]
    optim = torch.optim.AdamW(
        [{"params": model._backbone.parameters(), "lr": A.lr_backbone},
         {"params": other}],
        lr=args.lr,
    )
    criterion = SSDCriterion(
        matcher=SimpleMatcher(A),
        loss_fns={"class": SSDClassCriterion(), "local": SSDLocalCriterion(A)},
        loss_coef=A.coef_class_loss,
    )

    def batches_for(order):
        out = []
        for idx in order:
            imgs = torch.from_numpy(images[idx].transpose(0, 3, 1, 2)).contiguous()
            tgts = {
                "boxes": [torch.from_numpy(_xyxy_to_cxcyhw(box_list[i])) for i in idx],
                "labels": [torch.from_numpy(label_list[i].astype(np.int64)) for i in idx],
            }
            out.append((imgs, tgts))
        return out

    from torch.utils.tensorboard import SummaryWriter

    # raw pyramid predictions for shared scoring
    keep = list(range(args.num_cls)) + [args.num_cls + 1]

    def eval_preds():
        preds = []
        model.eval()
        with torch.no_grad():
            for s in range(0, len(val_images), args.batch):
                imgs = torch.from_numpy(
                    val_images[s : s + args.batch].transpose(0, 3, 1, 2)
                ).contiguous()
                out = model(imgs)
                preds.append(
                    {
                        "boxes": [t.numpy() for t in out["boxes"]],
                        "conf": [t.numpy()[..., keep] for t in out["conf"]],
                    }
                )
        return preds

    writer = SummaryWriter(log_dir="/tmp/ab_ssd_ref_runs")
    g_step, hist, snapshots = 0, [], {}
    t0 = time.time()
    for ep, order in enumerate(orders):
        model.train()
        loss, dur, g_step = train_one_epoch(
            A, model, criterion, writer=writer, g_step=g_step,
            optimizer=optim,
            dataloader=_Loader(batches_for(order), len(order) * args.batch),
        )
        hist.append(loss)
        print(f"[ref-ssd] epoch {ep}: loss={loss:.4f} ({dur:.1f}s)", flush=True)
        if getattr(args, "map_every", 0) and (ep + 1) % args.map_every == 0:
            snapshots[ep + 1] = eval_preds()

    return init_sd, eval_preds(), hist, time.time() - t0, snapshots


def run_ours(args, init_sd, images, box_list, label_list, orders, val_images,
             mining="reference"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from object_detection_destr_tpu.config import SSDConfig, TrainConfig
    from object_detection_destr_tpu.models.convert import ssd_variables_from_torch
    from object_detection_destr_tpu.models.ssd.model import build_ssd
    from object_detection_destr_tpu.train.optim import build_optimizer
    from object_detection_destr_tpu.train.state import TrainState
    from object_detection_destr_tpu.train.steps import make_ssd_train_step

    ssd_cfg = SSDConfig(num_cls=args.num_cls, hard_neg_mining=mining)
    train_cfg = TrainConfig(
        lr=args.lr, lr_backbone=args.lr_backbone, batch_size=args.batch,
        max_targets=args.max_boxes,
    )
    model = build_ssd(ssd_cfg)
    variables = ssd_variables_from_torch(init_sd, num_cls=args.num_cls)
    params = jax.tree.map(jnp.asarray, variables["params"])
    batch_stats = jax.tree.map(jnp.asarray, variables["batch_stats"])
    tx = build_optimizer(params, lr=args.lr, lr_backbone=args.lr_backbone)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=batch_stats,
        opt_state=tx.init(params), rng=jax.random.key(args.seed),
    )
    train_step = make_ssd_train_step(model, tx, train_cfg, ssd_cfg)

    cxcyhw = [_xyxy_to_cxcyhw(b) for b in box_list]
    boxes_pad, _, valid_pad = pad_targets(cxcyhw, args.max_boxes)
    labels_pad = np.zeros((len(label_list), args.max_boxes), np.int32)
    for i, lb in enumerate(label_list):
        labels_pad[i, : len(lb)] = lb[: args.max_boxes]

    apply = jax.jit(lambda v, x: model.apply(v, x))

    def eval_preds(state):
        preds = []
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        for s in range(0, len(val_images), args.batch):
            out = apply(variables, jnp.asarray(val_images[s : s + args.batch]))
            preds.append(
                {
                    "boxes": [np.asarray(t) for t in out["boxes"]],
                    "conf": [np.asarray(t) for t in out["conf"]],
                }
            )
        return preds

    hist, snapshots = [], {}
    t0 = time.time()
    for ep, order in enumerate(orders):
        ep_losses = []
        for idx in order:
            batch = {
                "images": jnp.asarray(images[idx]),
                "boxes": jnp.asarray(boxes_pad[idx]),
                "labels": jnp.asarray(labels_pad[idx]),
                "valid": jnp.asarray(valid_pad[idx]),
            }
            state, metrics = train_step(state, batch)
            ep_losses.append(float(metrics["loss"]))
        hist.append(float(np.mean(ep_losses)))
        print(f"[ours-ssd] epoch {ep}: loss={hist[-1]:.4f}", flush=True)
        if getattr(args, "map_every", 0) and (ep + 1) % args.map_every == 0:
            snapshots[ep + 1] = eval_preds(state)

    return eval_preds(state), hist, time.time() - t0, snapshots


def score(args, preds, val_boxes, val_labels):
    """Shared scoring: repo decode+NMS (``infer.predict.ssd_predict``) +
    MeanAveragePrecision. Both sides' raw pyramid outputs take the identical
    path."""
    import jax.numpy as jnp

    from object_detection_destr_tpu.config import SSDConfig
    from object_detection_destr_tpu.geometry.boxes import xyxy_to_cxcyhw
    from object_detection_destr_tpu.infer.predict import ssd_predict
    from object_detection_destr_tpu.losses.metrics import MeanAveragePrecision
    from object_detection_destr_tpu.train.steps import flat_anchors

    cfg = SSDConfig(num_cls=args.num_cls)
    anchors = flat_anchors(cfg)
    top = 32
    metric = MeanAveragePrecision(num_cls=args.num_cls, num_pred=top)
    state = metric.init_state()
    for i, p in enumerate(preds):
        det = ssd_predict(
            {"boxes": [jnp.asarray(t) for t in p["boxes"]],
             "conf": [jnp.asarray(t) for t in p["conf"]]},
            anchors, score_thresh=0.05, max_dets=top,
        )
        sc = np.clip(np.asarray(det["scores"]), 1e-6, 1 - 1e-6)
        sc = np.where(np.asarray(det["valid"]), sc, 1e-6)
        logits_at_label = np.log(sc / (1 - sc))  # sigmoid^-1(score)
        b, d = sc.shape
        pred_class = np.full((b, d, args.num_cls), -20.0, np.float32)
        lab = np.asarray(det["labels"])
        np.put_along_axis(pred_class, lab[..., None], logits_at_label[..., None], -1)
        pred_boxes = np.asarray(xyxy_to_cxcyhw(det["boxes"]))

        gt = val_boxes[i * args.batch : (i + 1) * args.batch]
        gl = val_labels[i * args.batch : (i + 1) * args.batch]
        boxes_pad, _, valid_pad = pad_targets(gt, args.max_boxes)
        labels_pad = np.zeros((len(gl), args.max_boxes), np.int32)
        for j, lb in enumerate(gl):
            labels_pad[j, : len(lb)] = lb[: args.max_boxes]
        state = metric.update(
            state,
            {"pred_class": jnp.asarray(pred_class),
             "pred_boxes": jnp.asarray(pred_boxes)},
            {"boxes": jnp.asarray(boxes_pad), "labels": jnp.asarray(labels_pad),
             "valid": jnp.asarray(valid_pad)},
        )
    return float(metric.compute(state))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-train", type=int, default=96)
    ap.add_argument("--num-val", type=int, default=32)
    ap.add_argument("--max-boxes", type=int, default=3)
    ap.add_argument("--num_cls", type=int, default=4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--lr-backbone", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mining", type=str, default="reference",
                    choices=["reference", "paper", "both"],
                    help="our side's hard-negative mining direction; 'both' "
                         "trains our side twice and reports both (REFCOMPAT "
                         "configurable quirk #5 — the reference's sort keeps "
                         "the easiest negatives)")
    ap.add_argument("--map-every", type=int, default=0,
                    help="score val mAP every N epochs on every side "
                         "(0 = endpoint only)")
    args = ap.parse_args(argv)

    # the whole A/B runs on CPU; pin before the first jax touch (scoring of
    # the reference happens ahead of run_ours, which used to do the pinning)
    import jax

    jax.config.update("jax_platforms", "cpu")
    size = 300  # the extra-block pyramid closes only at 300px

    images, box_list, label_list = build_shared_data(
        args.num_train, size, args.max_boxes, args.num_cls, args.seed
    )
    val_images, val_boxes, val_labels = build_shared_data(
        args.num_val, size, args.max_boxes, args.num_cls, args.seed + 10_000
    )
    orders = epoch_orders(args.num_train, args.batch, args.epochs)

    init_sd, ref_preds, ref_hist, ref_t, ref_snaps = run_reference(
        args, images, box_list, label_list, orders, val_images
    )
    ref_map = score(args, ref_preds, val_boxes, val_labels)

    curve = lambda snaps: {
        ep: round(score(args, p, val_boxes, val_labels), 4)
        for ep, p in snaps.items()
    }
    modes = ["reference", "paper"] if args.mining == "both" else [args.mining]
    result = {
        "protocol": {"train": args.num_train, "val": args.num_val,
                     "size": size, "batch": args.batch, "epochs": args.epochs,
                     "num_cls": args.num_cls, "lr": args.lr,
                     "map_every": args.map_every},
        "ref_map": round(ref_map, 4),
        "ref_loss_curve": [round(x, 2) for x in ref_hist],
        "ref_seconds": round(ref_t, 1),
        **({"ref_map_curve": curve(ref_snaps)} if ref_snaps else {}),
    }
    for mode in modes:
        ours_preds, ours_hist, ours_t, ours_snaps = run_ours(
            args, init_sd, images, box_list, label_list, orders, val_images,
            mining=mode,
        )
        ours_map = score(args, ours_preds, val_boxes, val_labels)
        sfx = "" if mode == "reference" else f"_{mode}"
        result[f"ours_map{sfx}"] = round(ours_map, 4)
        result[f"gap_pts{sfx}"] = round((ours_map - ref_map) * 100, 2)
        result[f"ours_loss_curve{sfx}"] = [round(x, 2) for x in ours_hist]
        result[f"ours_seconds{sfx}"] = round(ours_t, 1)
        if ours_snaps:
            result[f"ours_map_curve{sfx}"] = curve(ours_snaps)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
