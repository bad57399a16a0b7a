"""Prediction post-processing for DESTR and SSD.

* DESTR is set prediction: no NMS in the reference (SURVEY.md §3.3); we
  score with sigmoid class probabilities and threshold, returning padded
  detections + validity mask.
* SSD decode + suppress rebuilds ``NonMaximumSuppress``
  (non_maximum_suppress.py:11-85) with static shapes: per-image confidence
  sort, score threshold 0.5, and the reference's upper-triangular IoU < 0.5
  suppression rule (ops/nms.nms_triangular). REFCOMPAT: the orphan module
  builds its own default boxes with a 38-grid first scale, inconsistent with
  the training-side 37 (non_maximum_suppress.py:33 vs matcher.py:214); we
  use the model's actual grids.
"""

from __future__ import annotations

from functools import partial
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp

from ..geometry.boxes import cxcyhw_to_xyxy
from ..losses.matcher import decode_ssd_boxes
from ..ops.nms import nms_triangular

__all__ = ["destr_predict", "ssd_predict"]


@partial(jax.jit, static_argnames=("score_thresh", "max_dets"))
def destr_predict(
    outputs: Mapping[str, jnp.ndarray],
    score_thresh: float = 0.5,
    max_dets: int = 300,
):
    """Turn raw DESTR outputs into scored, thresholded detections.

    Args:
        outputs: {"pred_class": (B, K, C) logits, "pred_boxes": (B, K, 4) cxcyhw}.

    Returns:
        {"boxes": (B, D, 4) xyxy, "scores": (B, D), "labels": (B, D),
         "valid": (B, D)} with D = min(max_dets, K), score-sorted.
    """
    logits = outputs["pred_class"]
    probs = jax.nn.sigmoid(logits)
    # last channel is background (criterion.py:40-45's dummy class)
    fg = probs[..., :-1] if probs.shape[-1] > 1 else probs
    scores = jnp.max(fg, axis=-1)
    labels = jnp.argmax(fg, axis=-1).astype(jnp.int32)
    boxes = cxcyhw_to_xyxy(outputs["pred_boxes"])

    d = min(max_dets, scores.shape[-1])
    top_s, top_i = jax.lax.top_k(scores, d)
    take = lambda t: jnp.take_along_axis(t, top_i[..., None] if t.ndim == 3 else top_i, axis=1)
    return {
        "boxes": take(boxes),
        "scores": top_s,
        "labels": take(labels),
        "valid": top_s >= score_thresh,
    }


@partial(
    jax.jit,
    static_argnames=("score_thresh", "iou_thresh", "max_dets"),
)
def ssd_predict(
    outputs: Mapping[str, Sequence[jnp.ndarray]],
    anchors: jnp.ndarray,
    score_thresh: float = 0.5,
    iou_thresh: float = 0.5,
    max_dets: int = 200,
):
    """Decode + reference-rule NMS for SSD.

    Args:
        outputs: {"boxes": [6 x (B, H, W, A, 4)], "conf": [...]}.
        anchors: (S, 4) flattened default boxes (train/steps.flat_anchors).

    Returns:
        {"boxes": (B, D, 4) xyxy, "scores": (B, D), "labels": (B, D),
         "valid": (B, D)}, D = max_dets, confidence-sorted
        (non_maximum_suppress.py:60-85 semantics, padded instead of ragged).
    """
    flat = lambda seq: jnp.concatenate(
        [t.reshape(t.shape[0], -1, t.shape[-1]) for t in seq], axis=1
    )
    pred_boxes = flat(outputs["boxes"])  # (B, S, 4)
    conf = jax.nn.softmax(flat(outputs["conf"]), axis=-1)  # (B, S, C+1)

    decoded = cxcyhw_to_xyxy(decode_ssd_boxes(pred_boxes, anchors))
    # best non-background confidence (non_maximum_suppress.py:66-71)
    fg = conf[..., :-1]
    scores = jnp.max(fg, axis=-1)
    labels = jnp.argmax(fg, axis=-1).astype(jnp.int32)

    d = min(max_dets, scores.shape[-1])
    top_s, top_i = jax.lax.top_k(scores, d)
    boxes_k = jnp.take_along_axis(decoded, top_i[..., None], axis=1)
    labels_k = jnp.take_along_axis(labels, top_i, axis=1)

    def one(bx, sc):
        order, keep = nms_triangular(
            bx, sc, iou_thresh=iou_thresh, score_thresh=score_thresh
        )
        inv = jnp.argsort(order)  # map back to sorted-score order
        return keep[inv]

    keep = jax.vmap(one)(boxes_k, top_s)
    return {"boxes": boxes_k, "scores": top_s, "labels": labels_k, "valid": keep}
