"""Mean-average-precision metrics.

``MeanAveragePrecision`` re-designs the reference metric
(criterion.py:92-193) as a functional, device-resident accumulator: the
per-step ``update`` is jit-safe (vectorized greedy matching via ``lax.scan``,
no host transfer), and only the tiny ``compute`` (cumsum + 11-point
interpolation over a 300-long array) runs on host at epoch end.

Reference semantics reproduced exactly:
    * per image, predictions whose argmax-softmax class equals the metric
      class are selected and sorted by that class's probability
      (criterion.py:160-174);
    * greedy first-match-wins assignment at IoU >= threshold against
      not-yet-matched GTs, TP/FP accumulated **by per-image rank** (not by
      global score order across the dataset — criterion.py:178-193);
    * images with zero GTs of the class are skipped entirely (no FPs
      recorded, criterion.py:164-165);
    * 11-point interpolated AP (criterion.py:115-125).

A COCO-style AP (101-point, multi-IoU) lives in :class:`CocoAveragePrecision`
for the BASELINE.json north-star comparison.
"""

from __future__ import annotations

from functools import partial
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.boxes import cxcyhw_to_xyxy, pairwise_iou

__all__ = ["MeanAveragePrecision", "CocoAveragePrecision"]


def _update_one_class(
    tp: jnp.ndarray,
    fp: jnp.ndarray,
    num_gts: jnp.ndarray,
    cls: jnp.ndarray,
    outputs: Mapping[str, jnp.ndarray],
    targets: Mapping[str, jnp.ndarray],
    *,
    threshold: float,
    num_pred: int,
):
    """Accumulate TP/FP rank histograms for one (traced) class over a batch.

    ``cls`` is a traced scalar so the update vmaps over the class axis and
    compiles ONCE regardless of ``num_cls`` — a static class id compiled 20
    separate XLA programs for VOC, each minutes through the TPU tunnel.
    """
    logits = jnp.asarray(outputs["pred_class"], jnp.float32)  # (B, N, C)
    pred_xyxy = cxcyhw_to_xyxy(jnp.asarray(outputs["pred_boxes"], jnp.float32))
    gt_xyxy = jnp.asarray(targets["boxes"], jnp.float32)  # (B, T, 4)
    gt_valid = targets["valid"] & (targets["labels"] == cls)  # (B, T)

    probs = jax.nn.softmax(logits, axis=-1)
    pred_is_cls = jnp.argmax(probs, axis=-1) == cls  # (B, N)
    cls_prob = jnp.take_along_axis(
        probs, jnp.broadcast_to(cls, probs.shape[:-1])[..., None], axis=-1
    )[..., 0]

    # sort class predictions by probability; unselected sink to the bottom.
    # Only the top ``num_pred`` ranks ever contribute (the scan below runs
    # i < n_ranks), so slice the order BEFORE the gather + IoU: at SSD scale
    # (N=8432 anchors, 20 classes, b32, T=300) the full (C,B,N,T) IoU is a
    # 23 GB program — the top-rank slice is bit-identical and 28x smaller
    n_ranks = min(logits.shape[1], num_pred)
    sort_key = jnp.where(pred_is_cls, cls_prob, -jnp.inf)
    order = jnp.argsort(-sort_key, axis=-1)[:, :n_ranks]  # (B, n_ranks)
    boxes_sorted = jnp.take_along_axis(pred_xyxy, order[..., None], axis=1)
    n_sel = jnp.sum(pred_is_cls, axis=-1)  # (B,)

    iou = pairwise_iou(boxes_sorted, gt_xyxy)  # (B, n_ranks, T)
    iou = jnp.where(gt_valid[:, None, :], iou, -1.0)

    n_gt = jnp.sum(gt_valid, axis=-1)  # (B,)
    image_active = n_gt > 0  # ref skips 0-GT images (criterion.py:164-165)

    def per_image(iou_img, n_sel_img, active):
        def step(matched, i):
            row = iou_img[i]
            best = jnp.argmax(row)
            hit = (row[best] >= threshold) & ~matched[best]
            use = active & (i < n_sel_img)
            matched = matched.at[best].set(matched[best] | (hit & use))
            tp_i = (hit & use).astype(jnp.float32)
            fp_i = (~hit & use).astype(jnp.float32)
            return matched, (tp_i, fp_i)

        init = jnp.zeros((iou_img.shape[1],), bool)
        _, (tp_img, fp_img) = jax.lax.scan(step, init, jnp.arange(n_ranks))
        return tp_img, fp_img  # (n_ranks,)

    tp_b, fp_b = jax.vmap(per_image)(iou, n_sel, image_active)  # (B, n_ranks)
    tp = tp.at[:n_ranks].add(jnp.sum(tp_b, axis=0))
    fp = fp.at[:n_ranks].add(jnp.sum(fp_b, axis=0))
    num_gts = num_gts + jnp.sum(jnp.where(image_active, n_gt, 0))
    return tp, fp, num_gts


@partial(jax.jit, static_argnames=("threshold", "num_pred"))
def _update_all_classes(tp, fp, num_gts, outputs, targets, *, threshold, num_pred):
    """One compiled program for all classes: vmap of the per-class update."""
    classes = jnp.arange(tp.shape[0], dtype=jnp.int32)
    fn = partial(_update_one_class, threshold=threshold, num_pred=num_pred)
    return jax.vmap(fn, in_axes=(0, 0, 0, 0, None, None))(
        tp, fp, num_gts, classes, outputs, targets
    )


class MeanAveragePrecision:
    """Functional mAP accumulator (state in, state out).

    Usage::

        metric = MeanAveragePrecision(num_cls=1)
        state = metric.init_state()
        for batch in loader:
            state = metric.update(state, outputs, targets)  # on device
        ap = metric.compute(state)  # host scalar
    """

    def __init__(self, num_cls: int = 1, threshold: float = 0.5, num_pred: int = 300):
        self.num_cls = num_cls
        self.threshold = threshold
        self.num_pred = num_pred

    def init_state(self) -> dict:
        z = jnp.zeros((self.num_cls, self.num_pred), jnp.float32)
        return {
            "tp": z,
            "fp": z,
            "num_gts": jnp.zeros((self.num_cls,), jnp.int32),
        }

    def update(self, state: dict, outputs: Mapping, targets: Mapping) -> dict:
        tp, fp, num_gts = _update_all_classes(
            state["tp"],
            state["fp"],
            state["num_gts"],
            outputs,
            targets,
            threshold=self.threshold,
            num_pred=self.num_pred,
        )
        return {"tp": tp, "fp": fp, "num_gts": num_gts}

    def compute(self, state: dict) -> float:
        """11-point interpolated AP, averaged over classes (criterion.py:105-125)."""
        tp = np.asarray(state["tp"])
        fp = np.asarray(state["fp"])
        num_gts = np.asarray(state["num_gts"])
        aps = []
        for cls in range(self.num_cls):
            if num_gts[cls] == 0:
                aps.append(0.0)
                continue
            cum_tp = np.cumsum(tp[cls])
            cum_fp = np.cumsum(fp[cls])
            recall = cum_tp / num_gts[cls]
            with np.errstate(invalid="ignore"):
                precision = np.where(
                    cum_tp + cum_fp > 0, cum_tp / np.maximum(cum_tp + cum_fp, 1e-12), 0.0
                )
            ap = 0.0
            for t in np.arange(0.0, 1.1, 0.1):
                mask = recall >= t
                ap += (np.max(precision[mask]) if mask.any() else 0.0) / 11.0
            aps.append(float(ap))
        return float(np.mean(aps))


class CocoAveragePrecision:
    """COCO-style AP: score-ordered across the dataset, 101-point
    interpolation, averaged over IoU thresholds 0.5:0.95:0.05.

    Device side accumulates per-detection (score, tp@iou) records into
    fixed-size buffers; the PR sweep runs on host at compute time. This is
    the metric the BASELINE.json north star compares on; the reference has
    no COCO-mAP implementation (SURVEY.md §7 hard part 4).
    """

    IOU_THRESHOLDS = tuple(np.arange(0.5, 1.0, 0.05).round(2).tolist())

    def __init__(self, num_cls: int = 1, max_dets_per_image: int = 100):
        self.num_cls = num_cls
        self.max_dets = max_dets_per_image
        self._scores: list[np.ndarray] = []
        self._tp: list[np.ndarray] = []  # (n_dets, n_iou)
        self._num_gts = np.zeros((num_cls,), np.int64)

    def reset(self):
        self._scores, self._tp = [], []
        self._num_gts = np.zeros((self.num_cls,), np.int64)

    def update(self, outputs: Mapping, targets: Mapping) -> None:
        scores, tp, n_gt = _coco_batch_records(
            outputs,
            targets,
            num_cls=self.num_cls,
            max_dets=self.max_dets,
            iou_thresholds=self.IOU_THRESHOLDS,
        )
        # (B, C, K) scores, (B, C, K, n_iou) tp flags, (B, C) gt counts
        self._scores.append(np.asarray(scores))
        self._tp.append(np.asarray(tp))
        self._num_gts += np.asarray(n_gt).sum(axis=0)

    def compute(self) -> float:
        if not self._scores:
            return 0.0
        scores = np.concatenate(self._scores, axis=0)  # (B*, C, K)
        tps = np.concatenate(self._tp, axis=0)  # (B*, C, K, n_iou)
        recall_pts = np.linspace(0.0, 1.0, 101)
        aps = []
        for cls in range(self.num_cls):
            if self._num_gts[cls] == 0:
                continue
            s = scores[:, cls].reshape(-1)
            t = tps[:, cls].reshape(-1, len(self.IOU_THRESHOLDS))
            valid = s > -1.0  # padded slots carry score -1 (NaN also fails)
            s, t = s[valid], t[valid]
            if s.size == 0:  # no detections survived (e.g. a NaN epoch)
                aps.extend([0.0] * len(self.IOU_THRESHOLDS))
                continue
            order = np.argsort(-s, kind="stable")
            t = t[order]
            for j in range(len(self.IOU_THRESHOLDS)):
                cum_tp = np.cumsum(t[:, j])
                cum_fp = np.cumsum(1.0 - t[:, j])
                recall = cum_tp / self._num_gts[cls]
                precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-12)
                # monotone non-increasing precision envelope
                precision = np.maximum.accumulate(precision[::-1])[::-1]
                idx = np.searchsorted(recall, recall_pts, side="left")
                pr = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
                aps.append(pr.mean())
        return float(np.mean(aps)) if aps else 0.0


@partial(jax.jit, static_argnames=("num_cls", "max_dets", "iou_thresholds"))
def _coco_batch_records(outputs, targets, *, num_cls, max_dets, iou_thresholds):
    """Per-image, per-class top-K detection records for COCO AP."""
    logits = jnp.asarray(outputs["pred_class"], jnp.float32)
    pred_xyxy = cxcyhw_to_xyxy(jnp.asarray(outputs["pred_boxes"], jnp.float32))
    gt_xyxy = jnp.asarray(targets["boxes"], jnp.float32)
    probs = jax.nn.sigmoid(logits)  # detection scores, sigmoid per class
    thresholds = jnp.asarray(iou_thresholds, jnp.float32)

    def per_image(probs_img, boxes_img, gt_img, gt_valid_img, gt_labels_img):
        out_scores, out_tp, out_ngt = [], [], []
        for cls in range(num_cls):
            score = probs_img[:, cls]
            k = min(max_dets, score.shape[0])
            top_s, top_i = jax.lax.top_k(score, k)
            top_boxes = boxes_img[top_i]
            gvalid = gt_valid_img & (gt_labels_img == cls)
            iou = pairwise_iou(top_boxes, gt_img)  # (k, T)
            iou = jnp.where(gvalid[None, :], iou, -1.0)

            def step(matched, i):
                row = iou[i]
                # matched[t, j]: gt t already used at iou-threshold j
                row_m = jnp.where(matched.T, -1.0, row[None, :])  # (n_iou, T)
                best = jnp.argmax(row_m, axis=-1)  # (n_iou,)
                best_iou = jnp.take_along_axis(row_m, best[:, None], axis=-1)[:, 0]
                hit = best_iou >= thresholds
                matched = matched.at[best, jnp.arange(len(iou_thresholds))].set(
                    matched[best, jnp.arange(len(iou_thresholds))] | hit
                )
                return matched, hit.astype(jnp.float32)

            init = jnp.zeros((gt_img.shape[0], len(iou_thresholds)), bool)
            _, tp_flags = jax.lax.scan(step, init, jnp.arange(k))  # (k, n_iou)
            pad = max_dets - k
            out_scores.append(jnp.pad(top_s, (0, pad), constant_values=-1.0))
            out_tp.append(jnp.pad(tp_flags, ((0, pad), (0, 0))))
            out_ngt.append(jnp.sum(gvalid))
        return (
            jnp.stack(out_scores),
            jnp.stack(out_tp),
            jnp.stack(out_ngt),
        )

    return jax.vmap(per_image)(
        probs, pred_xyxy, gt_xyxy, targets["valid"], targets["labels"].astype(jnp.int32)
    )
