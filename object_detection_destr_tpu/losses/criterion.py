"""Set criterion (DESTR) and SSD criterion as pure, static-shape functions.

Re-design of the reference ``SetCriterion`` (criterion.py:15-79) and the SSD
criterion family (criterion.py:196-337). The reference loops over images on
the host and slices ragged matched sets; here every loss is computed over the
full padded batch with masks, so the whole criterion lives inside the jitted
train step.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp

from ..geometry.boxes import (
    cxcyhw_to_xyxy,
    elementwise_ciou,
    pairwise_ciou,
)
from ..ops.focal import sigmoid_focal_loss
from .matcher import decode_ssd_boxes, hungarian_match, ssd_match

__all__ = ["set_criterion", "ssd_criterion"]


def set_criterion(
    outputs: Mapping[str, jnp.ndarray],
    targets: Mapping[str, jnp.ndarray],
    *,
    cost_class: float = 1.0,
    cost_bbox: float = 0.0,
    cost_ciou: float = 1.0,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
    background_class: int | None = None,
    ciou_mode: str = "elementwise",
    class_norm: str = "queries",
    rows: jnp.ndarray | None = None,
    axis_name: str | None = None,
) -> dict[str, jnp.ndarray]:
    """DETR-style set criterion.

    Args:
        outputs: {"pred_class": (B, N, C) logits, "pred_boxes": (B, N, 4) cxcyhw}.
        targets: {"boxes": (B, T, 4) xyxy, "labels": (B, T), "valid": (B, T)}.
        background_class: label assigned to unmatched queries. The reference
            hardcodes dummy label 1 with ``one_hot(num_classes=2)``
            (criterion.py:40-45); the generalization is "last class is
            background", i.e. ``C - 1``.
        ciou_mode: "elementwise" (matched-pairs CIoU, the intended loss) or
            "reference" (mean over the full n_match x n_match pairwise CIoU
            matrix, reproducing CompleteIOULoss at criterion.py:82-89 which
            feeds *all pairs* of the matched sets into the mean).
        class_norm: focal-loss normalizer. "queries" divides the per-image
            focal sum by the number of prediction rows — the reference's
            choice (criterion.py:40-49 passes ``ordered_logits.size(0)``).
            "boxes" divides by the number of valid GT boxes (min 1), the
            DETR-family convention (Deformable-DETR criterion). At the
            production top_k=300 the reference normalization dilutes the
            positive-class gradient ~num_queries/num_gt (= ~67x at 4.5
            GT/image), which starves detection confidence — measured in the
            r4 production run (BASELINE.md). Documented shared extension,
            REFCOMPAT "class-loss normalization".
        rows: optional precomputed assignment (B, T) to share one matcher
            solve across criteria.
        axis_name: mesh data-axis name when called per-shard inside
            ``shard_map``. The batch reductions then psum/pmean across
            shards, so the returned losses equal the GLOBAL-batch criterion
            exactly (in particular the images-with-matches denominator of
            bbox/ciou spans the whole batch, not the local shard).

    Returns:
        {"class", "bbox", "ciou"} scalar losses, batch-reduced exactly like
        the reference (criterion.py:73-78): class is averaged over every
        image; bbox/ciou are averaged over images *with at least one match*
        and fall back to 0 when no image has matches.
    """
    pred_logits = jnp.asarray(outputs["pred_class"], jnp.float32)  # (B, N, C)
    pred_boxes = jnp.asarray(outputs["pred_boxes"], jnp.float32)  # (B, N, 4)
    b, n, num_cls = pred_logits.shape
    tgt_valid = targets["valid"]  # (B, T)
    labels = targets["labels"].astype(jnp.int32)
    if background_class is None:
        background_class = num_cls - 1

    if rows is None:
        rows = hungarian_match(
            outputs, targets, cost_class=cost_class, cost_bbox=cost_bbox, cost_ciou=cost_ciou
        )
    rows = jax.lax.stop_gradient(rows)  # matcher is @no_grad (matcher.py:55, 143)

    # ---- class loss (criterion.py:29-49) -------------------------------
    # The reference reorders logits matched-first and appends dummy labels;
    # focal loss sums over boxes, so ordering is irrelevant — scatter the
    # matched labels to their query slots instead.
    batch_idx = jnp.arange(b, dtype=jnp.int32)[:, None]
    scatter_labels = jnp.where(tgt_valid, labels, background_class)
    query_labels = jnp.full((b, n), background_class, jnp.int32)
    # rows is duplicate-free per image (assignment invariant), so plain set is safe
    query_labels = query_labels.at[batch_idx, rows].set(scatter_labels)
    one_hot = jax.nn.one_hot(query_labels, num_cls, dtype=pred_logits.dtype)
    if class_norm == "boxes":
        class_denom = jnp.maximum(jnp.sum(tgt_valid, axis=-1), 1).astype(jnp.float32)
    else:
        class_denom = float(n)
    class_loss = sigmoid_focal_loss(
        pred_logits, one_hot, num_boxes=class_denom, alpha=focal_alpha, gamma=focal_gamma
    )  # (B,)

    # ---- box losses over matched pairs (criterion.py:60-71) ------------
    # A target can be UNMATCHABLE when an image has more valid targets than
    # prediction rows (T_valid > N): the stacked/padded assignment then
    # parks it on a padding row (rows >= N). scipy's rectangular solve in
    # the reference simply leaves such targets out of the matched set, so
    # they drop from the box losses here too. (Without the guard, the
    # out-of-range take_along_axis gather fills NaN under jit — a silent
    # NaN for any top_k < #boxes config.)
    matched = tgt_valid & (rows < n)  # (B, T)
    pred_xyxy = cxcyhw_to_xyxy(pred_boxes)  # (B, N, 4)
    matched_pred = jnp.take_along_axis(
        pred_xyxy, jnp.minimum(rows, n - 1)[..., None], axis=1
    )  # (B, T, 4)
    gt_xyxy = jnp.asarray(targets["boxes"], jnp.float32)

    n_match = jnp.sum(matched, axis=-1)  # (B,)
    denom = jnp.maximum(n_match, 1).astype(jnp.float32)

    # nn.L1Loss(): mean over all elements of the matched set (4 * n_match)
    l1 = jnp.sum(
        jnp.abs(matched_pred - gt_xyxy) * matched[..., None], axis=(-1, -2)
    ) / (4.0 * denom)

    if ciou_mode == "reference":
        pair_valid = matched[:, :, None] & matched[:, None, :]
        ciou_mat = pairwise_ciou(matched_pred, gt_xyxy)  # (B, T, T)
        ciou = jnp.sum(jnp.where(pair_valid, ciou_mat, 0.0), axis=(-1, -2)) / (
            denom * denom
        )
    else:
        ciou = jnp.sum(
            elementwise_ciou(matched_pred, gt_xyxy) * matched, axis=-1
        ) / denom

    # ---- batch reduction (criterion.py:73-78) --------------------------
    has_match = (n_match > 0).astype(jnp.float32)
    if axis_name is None:
        num_with = jnp.maximum(jnp.sum(has_match), 1.0)
        return {
            "class": jnp.mean(class_loss),
            "bbox": jnp.sum(l1 * has_match) / num_with,
            "ciou": jnp.sum(ciou * has_match) / num_with,
        }
    # per-shard call under shard_map: global-batch semantics via collectives
    num_with = jnp.maximum(jax.lax.psum(jnp.sum(has_match), axis_name), 1.0)
    return {
        "class": jax.lax.pmean(jnp.mean(class_loss), axis_name),
        "bbox": jax.lax.psum(jnp.sum(l1 * has_match), axis_name) / num_with,
        "ciou": jax.lax.psum(jnp.sum(ciou * has_match), axis_name) / num_with,
    }


def _flatten_scales(per_scale: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """[(B, H, W, A, D)] x 6 -> (B, S, D), scale-major like the reference's
    ``flatten(1, 3)`` + concat (criterion.py:258-261, 316-319)."""
    flat = [t.reshape(t.shape[0], -1, t.shape[-1]) for t in per_scale]
    return jnp.concatenate(flat, axis=1)


def _smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    """Huber with beta=1 (torch smooth_l1_loss default)."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def ssd_criterion(
    outputs: Mapping[str, Sequence[jnp.ndarray]],
    targets: Mapping[str, jnp.ndarray],
    anchors: jnp.ndarray,
    *,
    loss_coef: float = 0.5,
    neg_pos_ratio: int = 3,
    iou_thresh: float = 0.5,
    eps: float = 1e-8,
    mining: str = "reference",
) -> dict[str, jnp.ndarray]:
    """SSD combined criterion: matching + localization + hard-negative class.

    Re-design of SSDCriterion / SSDLocalCriterion / SSDClassCriterion
    (criterion.py:196-337) with the reference's per-image loop defect fixed:
    its class loss statement sits *outside* the loop so only the last image
    contributes (criterion.py:334-335, SURVEY.md §2.1 #16); here every image
    contributes and the batch is averaged.

    Args:
        outputs: {"boxes": [6 x (B, H, W, A, 4)], "conf": [6 x (B, H, W, A, C+1)]}.
        targets: {"boxes": (B, T, 4) cxcyhw, "labels": (B, T), "valid": (B, T)}.
        anchors: (S, 4) flattened default boxes (geometry.default_boxes).
        loss_coef: blend ``coef * class + (1 - coef) * local``
            (criterion.py:211-225).
        mining: hard-negative selection direction. ``"reference"`` keeps the
            negatives with the HIGHEST background confidence — i.e. the
            *easiest* negatives, reproducing the reference's inverted sort
            (criterion.py:329-332 sorts bg conf descending and keeps the top
            3x#pos; the SSD paper mines the highest-LOSS negatives).
            ``"paper"`` keeps the lowest-background-confidence (hardest)
            negatives, the SSD-paper semantics. REFCOMPAT configurable quirk #5.

    Returns:
        {"loss", "class", "local"} scalars.
    """
    pred_boxes = _flatten_scales(outputs["boxes"])  # (B, S, 4)
    logits = _flatten_scales(outputs["conf"])  # (B, S, C+1)
    gt_cxcyhw = jnp.asarray(targets["boxes"], jnp.float32)  # (B, T, 4)
    gt_valid = targets["valid"]
    labels = targets["labels"].astype(jnp.int32)

    decoded = decode_ssd_boxes(pred_boxes, anchors)  # (B, S, 4) cxcyhw
    decoded_xyxy = cxcyhw_to_xyxy(decoded)
    gt_xyxy = cxcyhw_to_xyxy(gt_cxcyhw)
    # matching is a fixed target, like the reference's @no_grad matcher
    match, positive = jax.tree.map(
        jax.lax.stop_gradient,
        ssd_match(jax.lax.stop_gradient(decoded_xyxy), gt_xyxy, gt_valid, iou_thresh),
    )
    n_pairs = jnp.sum(match, axis=(-1, -2))  # (B,)

    # ---- localization: smooth-L1 on encoded offsets (criterion.py:255-291)
    # Layout matters enormously here: the naive (B, S, T, 4) pairwise form
    # puts 4 on the 128-lane minor dim and measured 23 ms/step at b8 (r2
    # profile) — ~30 GB/s effective. Everything below is per-coordinate
    # (B, T, S) with the ~8.4k anchors filling the lanes.
    match_t = jnp.swapaxes(match, 1, 2)  # (B, T, S)
    acx, acy, ah, aw = (anchors[:, i][None, None, :] for i in range(4))  # (1,1,S)
    gc = lambda i: gt_cxcyhw[..., i][..., None]  # (B, T, 1)
    pc = lambda i: pred_boxes[..., i][:, None, :]  # (B, 1, S)
    safe_ratio_h = jnp.where(match_t, gc(2) / jnp.maximum(ah, eps), 1.0)
    safe_ratio_w = jnp.where(match_t, gc(3) / jnp.maximum(aw, eps), 1.0)
    local_el = (
        _smooth_l1(pc(0) - (gc(0) - acx) / jnp.maximum(aw, eps))
        + _smooth_l1(pc(1) - (gc(1) - acy) / jnp.maximum(ah, eps))
        + _smooth_l1(pc(2) - jnp.log(jnp.maximum(safe_ratio_h, eps)))
        + _smooth_l1(pc(3) - jnp.log(jnp.maximum(safe_ratio_w, eps)))
    )  # (B, T, S)
    local_per_img = jnp.sum(
        jnp.where(match_t, local_el, 0.0), axis=(-1, -2)
    ) / jnp.maximum(4.0 * n_pairs, 1.0)

    # ---- classification: positive LL + hard negative mining
    # (criterion.py:294-337); log-softmax for stability, same selection.
    # The per-pair label gather is a one-hot batched matmul (MXU) instead of
    # a T-minor take_along_axis.
    log_conf = jax.nn.log_softmax(logits, axis=-1)  # (B, S, C+1)
    onehot = jax.nn.one_hot(labels, log_conf.shape[-1], dtype=log_conf.dtype)
    pos_ll = jnp.einsum("btc,bsc->bts", onehot, log_conf,
                        preferred_element_type=jnp.float32)  # (B, T, S)
    pos_term = jnp.sum(jnp.where(match_t, pos_ll, 0.0), axis=(-1, -2))  # (B,)

    n_pos = jnp.sum(positive, axis=-1)  # (B,)
    bg_ll = log_conf[..., -1]  # (B, S)
    if mining == "paper":
        # hardest negatives: LOWEST background log-prob first (positives
        # pushed to the end with +inf, excluded by keep_n <= n_neg)
        neg_sorted = jnp.sort(jnp.where(positive, jnp.inf, bg_ll), axis=-1)
    else:
        neg_ll = jnp.where(positive, -jnp.inf, bg_ll)
        neg_sorted = -jnp.sort(-neg_ll, axis=-1)  # descending: easiest first
    s = neg_sorted.shape[-1]
    n_neg = s - n_pos
    keep_n = jnp.minimum(neg_pos_ratio * n_pos, n_neg)  # (B,)
    rank = jnp.arange(s)[None, :]
    neg_keep = rank < keep_n[:, None]
    neg_term = jnp.sum(jnp.where(neg_keep, neg_sorted, 0.0), axis=-1)

    class_per_img = -(pos_term + neg_term)

    local = jnp.mean(local_per_img)
    class_ = jnp.mean(class_per_img)
    return {
        "loss": loss_coef * class_ + (1.0 - loss_coef) * local,
        "class": class_,
        "local": local,
    }
