"""On-device non-maximum suppression with static shapes.

Replaces the reference's ragged host-side loop
(non_maximum_suppress.py:66-85) with padded, mask-based device code. Two
variants:

* :func:`nms_triangular` — the reference's exact rule: sort by score, keep
  box i iff **every** higher-scored box has IoU < thresh with it
  (the upper-triangular mask at non_maximum_suppress.py:77-80). Note this is
  slightly more aggressive than greedy NMS: a box that is itself suppressed
  still suppresses others.
* :func:`nms_greedy` — textbook sequential greedy NMS via ``lax.fori_loop``
  (a suppressed box cannot suppress).

Both return fixed-size outputs + a validity mask instead of ragged lists.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.boxes import pairwise_iou

__all__ = ["nms_triangular", "nms_greedy"]


def _sort_by_score(boxes_xyxy, scores, score_thresh):
    order = jnp.argsort(-scores)
    boxes_s = jnp.take(boxes_xyxy, order, axis=0)
    scores_s = jnp.take(scores, order)
    valid = scores_s >= score_thresh
    return boxes_s, scores_s, valid, order


@partial(jax.jit, static_argnames=("iou_thresh", "score_thresh"))
def nms_triangular(
    boxes_xyxy: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float = 0.5,
    score_thresh: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-rule NMS for one image.

    Args:
        boxes_xyxy: (S, 4); scores: (S,).

    Returns:
        (keep_idx, keep_mask): (S,) int32 indices into the original order and
        (S,) bool — only positions with keep_mask True are real detections.
    """
    boxes_s, _, valid, order = _sort_by_score(boxes_xyxy, scores, score_thresh)
    iou = pairwise_iou(boxes_s, boxes_s)
    s = scores.shape[0]
    tri = jnp.triu(jnp.ones((s, s), bool), k=1)  # row j suppresses col i for j < i
    suppress_mask = tri & (iou >= iou_thresh) & valid[:, None]
    keep = ~jnp.any(suppress_mask, axis=0) & valid
    return order.astype(jnp.int32), keep


@partial(jax.jit, static_argnames=("iou_thresh", "score_thresh"))
def nms_greedy(
    boxes_xyxy: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thresh: float = 0.5,
    score_thresh: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sequential greedy NMS for one image (fixed iteration count S)."""
    boxes_s, _, valid, order = _sort_by_score(boxes_xyxy, scores, score_thresh)
    iou = pairwise_iou(boxes_s, boxes_s)
    s = scores.shape[0]

    def body(i, keep):
        # if box i survives, suppress all later boxes overlapping it
        alive_i = keep[i]
        suppress = (iou[i] >= iou_thresh) & (jnp.arange(s) > i) & alive_i
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, s, body, valid)
    return order.astype(jnp.int32), keep
