"""Reference-vs-repo accuracy A/B at miniature scale (BASELINE.json north
star, VERDICT r1 #5).

Protocol — everything that can be shared IS shared:
  * one deterministic synthetic detection dataset (bright boxes on noise,
    single class, WIDER-like), identical pixels/targets on both sides;
  * identical model config, identical *initial weights* (the reference
    model's fresh torch init converted via ``destr_variables_from_torch``);
  * identical optimizer (AdamW, same lr/wd, frozen backbone both sides),
    identical loss wiring (class 0.5 / ciou 0.5, 0.7*model + 0.3*det),
    identical batch order, dropout zeroed on both sides;
  * the REFERENCE is trained by its own ``train_one_epoch``
    (src/train/train.py:141-223) with its own SetCriterion /
    HungarianMatcherWoL1 (intended config, REFCOMPAT #6) — not a rewrite;
  * final eval: both models' predictions scored by the SAME metric code —
    the repo ``MeanAveragePrecision``, exact-parity-proven against the
    reference metric (tests/test_reference_parity.py:279) but with the
    reference's rank-0 0/0 -> NaN defect guarded (REFCOMPAT #11; the raw
    reference metric returns NaN whenever any image's top-ranked
    prediction misses).

Run:  python tools/ab_reference.py [--epochs 6] [--train-size 160] ...
Emits one JSON line; record the table in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def build_shared_data(n, image_size, max_boxes, seed):
    """(images_norm (N,S,S,3) f32, list[ (K_i,4) xyxy ], T_max)."""
    from object_detection_destr_tpu.data.datasets import SyntheticDetection

    ds = SyntheticDetection(
        num_samples=n, image_size=image_size, max_boxes=max_boxes, seed=seed
    )
    images, boxes = [], []
    for i in range(n):
        img, bx, _ = ds[i]
        images.append((img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD)
        boxes.append(bx)
    return np.stack(images), boxes


def pad_targets(box_list, t_max):
    n = len(box_list)
    boxes = np.zeros((n, t_max, 4), np.float32)
    valid = np.zeros((n, t_max), bool)
    for i, bx in enumerate(box_list):
        k = min(len(bx), t_max)
        boxes[i, :k] = bx[:k]
        valid[i, :k] = True
    labels = np.zeros((n, t_max), np.int32)
    return boxes, labels, valid


def epoch_orders(n, batch, epochs, seed=123):
    """Identical batch order for both sides."""
    rng = np.random.default_rng(seed)
    orders = []
    for _ in range(epochs):
        perm = rng.permutation(n)
        usable = (n // batch) * batch
        orders.append(perm[:usable].reshape(-1, batch))
    return orders


# ---------------------------------------------------------------- reference


class _Loader:
    """Minimal stand-in for DataLoader: iterates prebuilt batches; exposes
    ``.dataset`` for train_one_epoch's ``len(dataloader.dataset)``."""

    def __init__(self, batches, num_items):
        self.batches = batches
        self.dataset = list(range(num_items))

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def run_reference(args, images, box_list, orders, val_images, val_boxes):
    import torch

    from tools.ref_torch_models import (
        _ensure_reference_importable,
        build_reference_destr,
        repair_reference_minidet_bn,
        zero_reference_dropout,
    )

    _ensure_reference_importable()
    from src.train.train import train_one_epoch
    from src.utils.criterion import (
        CompleteIOULoss,
        MeanAveragePrecision,
        SetCriterion,
    )
    from src.utils.matcher import HungarianMatcherWoL1
    from src.utils.misc import sigmoid_focal_loss

    class A:
        hidden_dim = 256
        num_encoder_blocks = args.blocks
        num_decoder_blocks = args.blocks
        top_k = args.top_k
        num_cls = 2
        lr_backbone = args.lr_backbone
        resume = False
        device = "cpu"
        batch_size = args.batch
        set_cost_class = 0.5
        set_cost_bbox = 0.0
        set_cost_ciou = 0.5

    torch.manual_seed(args.seed)
    model = build_reference_destr(A())
    zero_reference_dropout(model)
    # init_sd is captured in the reference's native (defective) key layout —
    # destr_variables_from_torch expects it and routes the misplaced BNs back
    init_sd = {k: v.clone() for k, v in model.state_dict().items()}
    if getattr(args, "repair_bn", False):
        # Strongest-baseline mode (VERDICT r2 #1): run the reference with its
        # mini-detector BN wiring repaired so its loss actually optimizes,
        # instead of beating a trainer frozen by its own defect. At a fresh
        # init every BN is identity in eval mode, so both sides still start
        # from identical effective weights.
        repair_reference_minidet_bn(model)

    # the reference's __main__ optimizer (train.py:240-251); with
    # lr_backbone>0 the reference trains layer2-4 and freezes stem+layer1
    # (backbone.py:92-99) — our optax param labels mirror exactly
    other = [p for n_, p in model.named_parameters() if "backbone" not in n_]
    optim = torch.optim.AdamW(
        [{"params": model._backbone.parameters(), "lr": A.lr_backbone},
         {"params": other}],
        lr=args.lr,
    )
    criterion = SetCriterion(
        num_classes=A.num_cls,
        matcher=HungarianMatcherWoL1(cost_class=1, cost_ciou=1),
        loss_fn={
            "class": sigmoid_focal_loss,
            "bbox": torch.nn.L1Loss(),
            "ciou": CompleteIOULoss(),
        },
    )

    def batches_for(order):
        out = []
        for idx in order:
            imgs = torch.from_numpy(
                images[idx].transpose(0, 3, 1, 2)
            ).contiguous()
            tgts = tuple(
                {
                    "boxes": torch.from_numpy(box_list[i]),
                    "labels": torch.zeros(len(box_list[i]), dtype=torch.long),
                }
                for i in idx
            )
            out.append((imgs, tgts))
        return out

    from torch.utils.tensorboard import SummaryWriter

    writer = SummaryWriter(log_dir="/tmp/ab_ref_runs")
    loss_weights = {"class": A.set_cost_class, "bbox": A.set_cost_bbox,
                    "ciou": A.set_cost_ciou}

    # init-parity check: loss of the very first batch from the shared init
    # (deepcopy so train-mode BN stat updates don't perturb the real model)
    import copy as _copy

    from src.utils.misc import reduce_dict

    probe = _copy.deepcopy(model)
    probe.train()
    with torch.no_grad():
        imgs0, tgts0 = batches_for(orders[0][:1])[0]
        mo, do = probe(imgs0)
        l0 = (reduce_dict(criterion(mo, tgts0), weights=loss_weights) * 0.7
              + reduce_dict(criterion(do, tgts0), weights=loss_weights) * 0.3)
    init_loss = float(l0)
    del probe

    # eval: collect raw predictions; scoring happens in main() with the repo
    # metric (parity-proven vs the reference metric, which NaNs on rank-0
    # misses — REFCOMPAT #11)
    def eval_preds():
        preds = []
        model.eval()
        with torch.no_grad():
            for s in range(0, len(val_images), args.batch):
                imgs = torch.from_numpy(
                    val_images[s : s + args.batch].transpose(0, 3, 1, 2)
                ).contiguous()
                out, _ = model(imgs)
                preds.append(
                    {
                        "pred_class": out["pred_class"].numpy(),
                        "pred_boxes": out["pred_boxes"].numpy(),
                    }
                )
        return preds

    g_step, hist, snapshots = 0, [], {}
    t0 = time.time()
    for ep, order in enumerate(orders):
        if args.lr_drop and ep == args.lr_drop:
            for g in optim.param_groups:  # same x0.1 drop on both sides
                g["lr"] *= 0.1
        model.train()
        lm, ld, dur, g_step = train_one_epoch(
            A, model, criterion, writer=writer, g_step=g_step,
            loss_weights=loss_weights, optimizer=optim,
            dataloader=_Loader(batches_for(order), len(order) * args.batch),
        )
        hist.append(lm)
        print(f"[ref] epoch {ep}: loss_model={lm:.4f} loss_det={ld:.4f} "
              f"({dur:.1f}s)", flush=True)
        if args.map_every and (ep + 1) % args.map_every == 0:
            snapshots[ep + 1] = eval_preds()

    preds = eval_preds()
    return init_sd, preds, hist, time.time() - t0, init_loss, snapshots


# --------------------------------------------------------------------- ours


def run_ours(args, init_sd, images, box_list, orders, val_images, val_boxes):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from object_detection_destr_tpu.config import DestrConfig, TrainConfig
    from object_detection_destr_tpu.models.convert import destr_variables_from_torch
    from object_detection_destr_tpu.models.destr.model import build_destr
    from object_detection_destr_tpu.train.optim import build_optimizer
    from object_detection_destr_tpu.train.state import TrainState
    from object_detection_destr_tpu.train.steps import make_destr_train_step

    sys.path.insert(0, "/root/reference")
    from src.utils.criterion import MeanAveragePrecision

    cfg = DestrConfig(
        num_encoder_blocks=args.blocks, num_decoder_blocks=args.blocks,
        top_k=args.top_k, num_cls=2, dropout=0.0,
    )
    train_cfg = TrainConfig(
        lr=args.lr, lr_backbone=args.lr_backbone, batch_size=args.batch,
        image_size=args.train_size, max_targets=args.max_boxes,
    )
    model = build_destr(cfg)
    variables = destr_variables_from_torch(init_sd, args.blocks, args.blocks)
    params = jax.tree.map(jnp.asarray, variables["params"])
    batch_stats = jax.tree.map(jnp.asarray, variables["batch_stats"])
    lr = args.lr
    lr_bb = args.lr_backbone
    if args.lr_drop:
        # same x0.1 step drop as the torch side, as an optax schedule
        steps_per_epoch = (len(images) // args.batch)
        drop_at = args.lr_drop * steps_per_epoch
        lr = lambda step: args.lr * jnp.where(step >= drop_at, 0.1, 1.0)
        if args.lr_backbone > 0:
            lr_bb = lambda step: args.lr_backbone * jnp.where(
                step >= drop_at, 0.1, 1.0
            )
    tx = build_optimizer(params, lr=lr, lr_backbone=lr_bb)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=batch_stats,
        opt_state=tx.init(params), rng=jax.random.key(args.seed),
    )
    train_step = make_destr_train_step(model, tx, train_cfg)

    boxes_pad, labels_pad, valid_pad = pad_targets(box_list, args.max_boxes)
    apply = jax.jit(lambda v, x: model.apply(v, x, train=False))

    # eval: collect raw predictions; scoring happens in main()
    def eval_preds(state):
        preds = []
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        for s in range(0, len(val_images), args.batch):
            out, _ = apply(variables, jnp.asarray(val_images[s : s + args.batch]))
            preds.append(
                {
                    "pred_class": np.asarray(out["pred_class"]),
                    "pred_boxes": np.asarray(out["pred_boxes"]),
                }
            )
        return preds

    hist, init_loss, snapshots = [], None, {}
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
            if init_loss is None:
                init_loss = float(metrics["loss"])  # pre-update loss, batch 0
            ep_losses.append(float(metrics["loss_model"]))
        hist.append(float(np.mean(ep_losses)))
        print(f"[ours] epoch {ep}: loss_model={hist[-1]:.4f}", flush=True)
        if args.map_every and (ep + 1) % args.map_every == 0:
            snapshots[ep + 1] = eval_preds(state)

    preds = eval_preds(state)
    return preds, hist, time.time() - t0, init_loss, snapshots


def score(preds, val_boxes, batch, top_k, max_boxes):
    """Repo MeanAveragePrecision over batched predictions (both sides go
    through this identical code path)."""
    import jax.numpy as jnp

    from object_detection_destr_tpu.losses.metrics import MeanAveragePrecision

    metric = MeanAveragePrecision(num_cls=1, num_pred=top_k)
    state = metric.init_state()
    for i, p in enumerate(preds):
        bxs = val_boxes[i * batch : (i + 1) * batch]
        boxes, labels, valid = pad_targets(bxs, max_boxes)
        state = metric.update(
            state,
            {"pred_class": jnp.asarray(p["pred_class"]),
             "pred_boxes": jnp.asarray(p["pred_boxes"])},
            {"boxes": jnp.asarray(boxes), "labels": jnp.asarray(labels),
             "valid": jnp.asarray(valid)},
        )
    return float(metric.compute(state))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-size", type=int, default=160)
    ap.add_argument("--num-train", type=int, default=192)
    ap.add_argument("--num-val", type=int, default=48)
    ap.add_argument("--max-boxes", type=int, default=6)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--blocks", type=int, default=2)
    ap.add_argument("--top_k", type=int, default=12)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--lr-backbone", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--repair-bn", action="store_true",
        help="run the reference with its mini-detector BN wiring repaired "
             "(strongest baseline; REFCOMPAT #1)",
    )
    ap.add_argument(
        "--map-every", type=int, default=0,
        help="score val mAP every N epochs on BOTH sides (0 = endpoint only)"
             " — a full curve instead of one endpoint snapshot",
    )
    ap.add_argument(
        "--lr-drop", type=int, default=0,
        help="x0.1 lr drop at this epoch, applied identically to both sides "
             "(0 = constant lr, the reference trainer's own behavior)",
    )
    args = ap.parse_args(argv)

    images, box_list = build_shared_data(
        args.num_train, args.train_size, args.max_boxes, seed=args.seed
    )
    val_images, val_boxes = build_shared_data(
        args.num_val, args.train_size, args.max_boxes, seed=args.seed + 10_000
    )
    orders = epoch_orders(args.num_train, args.batch, args.epochs)

    init_sd, ref_preds, ref_hist, ref_t, ref_l0, ref_snaps = run_reference(
        args, images, box_list, orders, val_images, val_boxes
    )
    ours_preds, ours_hist, ours_t, ours_l0, ours_snaps = run_ours(
        args, init_sd, images, box_list, orders, val_images, val_boxes
    )
    ref_map = score(ref_preds, val_boxes, args.batch, args.top_k, args.max_boxes)
    ours_map = score(ours_preds, val_boxes, args.batch, args.top_k, args.max_boxes)
    map_curves = {}
    if args.map_every:
        map_curves = {
            side: {
                ep: round(score(p, val_boxes, args.batch, args.top_k,
                                args.max_boxes), 4)
                for ep, p in snaps.items()
            }
            for side, snaps in (("ref", ref_snaps), ("ours", ours_snaps))
        }

    result = {
        "protocol": {
            "train": args.num_train, "val": args.num_val,
            "size": args.train_size, "batch": args.batch,
            "epochs": args.epochs, "blocks": args.blocks,
            "top_k": args.top_k, "lr": args.lr,
            "max_boxes": args.max_boxes, "repair_bn": bool(args.repair_bn),
            "lr_drop": args.lr_drop, "map_every": args.map_every,
        },
        **({"map_curves": map_curves} if map_curves else {}),
        "init_loss_ref": round(ref_l0, 4),
        "init_loss_ours": round(ours_l0, 4),
        "ref_map": round(ref_map, 4),
        "ours_map": round(ours_map, 4),
        "gap_pts": round((ours_map - ref_map) * 100, 2),
        "ref_loss_curve": [round(x, 4) for x in ref_hist],
        "ours_loss_curve": [round(x, 4) for x in ours_hist],
        "ref_seconds": round(ref_t, 1),
        "ours_seconds": round(ours_t, 1),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
