"""Box geometry library (pure jnp, no framework deps).

Conventions (inherited from the reference implementation, see
/root/reference/src/utils/bbox_utils.py):

* Boxes are normalized to ``[0, 1]``.
* ``cxcyhw`` means ``(center_x, center_y, height, width)`` — note **h before w**,
  an unusual ordering the reference uses everywhere (bbox_utils.py:33-63).
* Conversions clip into ``[0, 1]`` exactly like the reference:
  ``cxcyhw_to_xyxy`` clips x1/y1 at 0 and x2/y2 at 1 (bbox_utils.py:53-61);
  ``xyxy_to_cxcyhw`` clips every output component into [0, 1]
  (bbox_utils.py:85-101).
* ``pairwise_*`` functions broadcast an ``(..., N, 4)`` against an
  ``(..., M, 4)`` to an ``(..., N, M)`` result (bbox_utils.py:201-216).

Everything here is shape-polymorphic, jit-safe (static shapes, no Python
branching on values), and differentiable where the reference is.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "cxcyhw_to_xyxy",
    "xyxy_to_cxcyhw",
    "xywh_to_xyxy",
    "pairwise_iou",
    "pairwise_ciou",
    "elementwise_iou",
    "elementwise_ciou",
    "box_l1_size",
    "flat_box_mask",
    "make_grid",
    "default_boxes",
    "clip_boxes_to_window",
]


def cxcyhw_to_xyxy(boxes: jnp.ndarray, min_val: float = 0.0, max_val: float = 1.0) -> jnp.ndarray:
    """(cx, cy, h, w) -> (x1, y1, x2, y2), clipping x1/y1 >= min and x2/y2 <= max.

    Mirrors reference ``from_cxcyhw_to_xyxy`` (bbox_utils.py:33-63): only the
    mins are clipped from below and the maxes from above.
    """
    cx, cy, h, w = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack(
        [
            jnp.maximum(cx - w / 2, min_val),
            jnp.maximum(cy - h / 2, min_val),
            jnp.minimum(cx + w / 2, max_val),
            jnp.minimum(cy + h / 2, max_val),
        ],
        axis=-1,
    )


def xyxy_to_cxcyhw(boxes: jnp.ndarray, min_val: float = 0.0, max_val: float = 1.0) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, h, w), every component clipped into [min, max].

    Mirrors reference ``from_xyxy_to_cxcyhw`` (bbox_utils.py:66-103).
    """
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    clip = lambda v: jnp.clip(v, min_val, max_val)
    return jnp.stack(
        [clip((x1 + x2) / 2), clip((y1 + y2) / 2), clip(y2 - y1), clip(x2 - x1)],
        axis=-1,
    )


def xywh_to_xyxy(boxes: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """(x1, y1, w, h) -> (x1, y1, x2, y2), clipping x2/y2 <= max.

    Mirrors reference ``from_xywh_to_xyxy`` (bbox_utils.py:106-139).
    """
    x1, y1, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack(
        [x1, y1, jnp.minimum(x1 + w, max_val), jnp.minimum(y1 + h, max_val)],
        axis=-1,
    )


def _area_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """Broadcasted IoU of (..., N, 4) x (..., M, 4) xyxy boxes -> (..., N, M).

    Mirrors reference ``get_iou`` (bbox_utils.py:201-216): intersection w/h
    clamped at 0, union clamped at ``epsilon``.
    """
    b1 = boxes1[..., :, None, :]
    b2 = boxes2[..., None, :, :]
    inter_mins = jnp.maximum(b1[..., :2], b2[..., :2])
    inter_maxs = jnp.minimum(b1[..., 2:], b2[..., 2:])
    inter_wh = jnp.maximum(inter_maxs - inter_mins, 0.0)
    inter_area = inter_wh[..., 0] * inter_wh[..., 1]
    union = _area_xyxy(b1) + _area_xyxy(b2) - inter_area
    return inter_area / jnp.maximum(union, epsilon)


def pairwise_ciou(
    pred_xyxy: jnp.ndarray, gt_xyxy: jnp.ndarray, epsilon: float = 1e-6
) -> jnp.ndarray:
    """Complete-IoU *loss* matrix: ``1 - CIoU`` for every (pred, gt) pair.

    (..., N, 4) x (..., M, 4) -> (..., N, M). Mirrors reference
    ``complete_iou`` (bbox_utils.py:160-198):

    * the aspect-ratio term ``alpha * v`` only activates where IoU > 0.5,
      with ``alpha`` treated as a constant (no gradient; bbox_utils.py:191-194)
    * CIoU is clamped into [-1, 1] before the ``1 -`` (bbox_utils.py:195-198)
    * aspect term uses atan(w / h) of the cxcyhw form (h clamped >= epsilon)
    """
    pred_c = xyxy_to_cxcyhw(pred_xyxy)
    gt_c = xyxy_to_cxcyhw(gt_xyxy)

    iou = pairwise_iou(pred_xyxy, gt_xyxy, epsilon)

    p = pred_xyxy[..., :, None, :]
    g = gt_xyxy[..., None, :, :]
    # diagonal of the smallest enclosing box
    enclose_wh = jnp.maximum(
        jnp.maximum(p[..., 2:], g[..., 2:]) - jnp.minimum(p[..., :2], g[..., :2]), 0.0
    )
    diag_sq = jnp.sum(enclose_wh**2, axis=-1)

    center_delta = pred_c[..., :, None, :2] - gt_c[..., None, :, :2]
    center_dist_sq = jnp.sum(center_delta**2, axis=-1)

    # v: (4 / pi^2) * (atan(w_gt / h_gt) - atan(w_pred / h_pred))^2
    atan_gt = jnp.arctan(gt_c[..., 3] / jnp.maximum(gt_c[..., 2], epsilon))
    atan_pred = jnp.arctan(pred_c[..., 3] / jnp.maximum(pred_c[..., 2], epsilon))
    v = (4.0 / math.pi**2) * (atan_gt[..., None, :] - atan_pred[..., :, None]) ** 2

    large_iou = jax.lax.stop_gradient((iou > 0.5).astype(v.dtype))
    alpha = jax.lax.stop_gradient(large_iou * (v / (1.0 - iou + v)))

    cious = iou - center_dist_sq / jnp.maximum(diag_sq, epsilon) - alpha * v
    cious = jnp.clip(cious, -1.0, 1.0)
    return 1.0 - cious


def elementwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """IoU of aligned (..., 4) xyxy box pairs -> (...)."""
    inter_mins = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    inter_maxs = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    inter_wh = jnp.maximum(inter_maxs - inter_mins, 0.0)
    inter_area = inter_wh[..., 0] * inter_wh[..., 1]
    union = _area_xyxy(boxes1) + _area_xyxy(boxes2) - inter_area
    return inter_area / jnp.maximum(union, epsilon)


def elementwise_ciou(
    pred_xyxy: jnp.ndarray, gt_xyxy: jnp.ndarray, epsilon: float = 1e-6
) -> jnp.ndarray:
    """Complete-IoU loss ``1 - CIoU`` for aligned (..., 4) pairs -> (...).

    Same numerics as :func:`pairwise_ciou` restricted to the diagonal — this is
    the (fixed) matched-pairs form of the reference's all-pairs CIoU mean
    (criterion.py:82-89 applies the N×M matrix mean; see REFCOMPAT.md).
    """
    pred_c = xyxy_to_cxcyhw(pred_xyxy)
    gt_c = xyxy_to_cxcyhw(gt_xyxy)
    iou = elementwise_iou(pred_xyxy, gt_xyxy, epsilon)

    enclose_wh = jnp.maximum(
        jnp.maximum(pred_xyxy[..., 2:], gt_xyxy[..., 2:])
        - jnp.minimum(pred_xyxy[..., :2], gt_xyxy[..., :2]),
        0.0,
    )
    diag_sq = jnp.sum(enclose_wh**2, axis=-1)
    center_dist_sq = jnp.sum((pred_c[..., :2] - gt_c[..., :2]) ** 2, axis=-1)

    atan_gt = jnp.arctan(gt_c[..., 3] / jnp.maximum(gt_c[..., 2], epsilon))
    atan_pred = jnp.arctan(pred_c[..., 3] / jnp.maximum(pred_c[..., 2], epsilon))
    v = (4.0 / math.pi**2) * (atan_gt - atan_pred) ** 2

    large_iou = jax.lax.stop_gradient((iou > 0.5).astype(v.dtype))
    alpha = jax.lax.stop_gradient(large_iou * (v / (1.0 - iou + v)))

    cious = jnp.clip(iou - center_dist_sq / jnp.maximum(diag_sq, epsilon) - alpha * v, -1.0, 1.0)
    return 1.0 - cious


def box_l1_size(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """|w| + |h| per box — the pair-ordering key of DESTR pair attention
    (pair_self_attention.py:152-154)."""
    return jnp.abs(boxes_xyxy[..., 2] - boxes_xyxy[..., 0]) + jnp.abs(
        boxes_xyxy[..., 3] - boxes_xyxy[..., 1]
    )


def flat_box_mask(boxes_xyxy: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """True where a box has positive width AND height.

    Static-shape replacement for the reference's ``filter_flat_box``
    (bbox_utils.py:219-229): instead of dropping rows, callers combine this
    mask with the padding mask.
    """
    w = boxes_xyxy[..., 2] - boxes_xyxy[..., 0]
    h = boxes_xyxy[..., 3] - boxes_xyxy[..., 1]
    return (w > epsilon) & (h > epsilon)


def make_grid(height: int, width: int, bias: float = 0.5, norm: bool = True) -> jnp.ndarray:
    """(height, width, 2) grid of (y, x) cell coordinates.

    Mirrors reference ``make_grid`` (misc.py:131-149): ``grid[i, j] =
    ((i + bias) / height, (j + bias) / width)`` when ``norm``.
    """
    h = jnp.arange(height, dtype=jnp.float32) + bias
    w = jnp.arange(width, dtype=jnp.float32) + bias
    if norm:
        h = h / height
        w = w / width
    gy, gx = jnp.meshgrid(h, w, indexing="ij")
    return jnp.stack([gy, gx], axis=-1)


def default_boxes(
    shapes: Sequence[int],
    scales: Sequence[float],
    aspect_ratios: Sequence[Sequence[float]],
) -> list[jnp.ndarray]:
    """SSD default (anchor) boxes, one ``(H, W, A, 4)`` cxcyhw array per scale.

    Mirrors reference ``gen_default_boxes`` (bbox_utils.py:232-260): per cell,
    anchors are (s, s), (sqrt(s*s'), sqrt(s*s')), then for each aspect ratio
    ``ar`` the pair (s*sqrt(ar), s/sqrt(ar)) and its transpose — all stored as
    (h, w). Centers come from :func:`make_grid` which yields (y, x); the
    reference concatenates [centers, hw] so anchor[..., 0] is the *y*-ish
    coordinate. We keep that layout bit-for-bit for parity.
    """
    out = []
    for ind, (shape, ars) in enumerate(zip(shapes, aspect_ratios)):
        centers = make_grid(shape, shape, bias=0.5, norm=True)  # (H, W, 2)
        s = float(scales[ind])
        g = math.sqrt(float(scales[ind]) * float(scales[ind + 1]))
        hw_pairs = [(s, s), (g, g)]
        for ar in ars:
            r = math.sqrt(ar)
            hw_pairs.append((s * r, s / r))
            hw_pairs.append((s / r, s * r))
        hw = jnp.asarray(hw_pairs, dtype=jnp.float32)  # (A, 2)
        num_a = hw.shape[0]
        centers_a = jnp.broadcast_to(centers[:, :, None, :], (shape, shape, num_a, 2))
        hw_a = jnp.broadcast_to(hw[None, None, :, :], (shape, shape, num_a, 2))
        out.append(jnp.concatenate([centers_a, hw_a], axis=-1))
    return out


def clip_boxes_to_window(
    boxes_cxcyhw: jnp.ndarray,
    window_xyxy: tuple,
    origin_hw: tuple,
) -> jnp.ndarray:
    """Re-clip cxcyhw pixel boxes into a crop window (SSD random patch).

    Functional equivalent of reference ``update_coord_new_boundary``
    (bbox_utils.py:263-311): convert to corners, clamp corners into the
    window, convert back to cxcyhw clipped into the original canvas.

    ``window_xyxy`` = (min_x, min_y, max_x, max_y); ``origin_hw`` = (H, W).
    Coordinates remain in the original-image frame — callers subtract the
    window origin afterwards if they rebase.
    """
    min_x, min_y, max_x, max_y = window_xyxy
    h_lim, w_lim = origin_hw
    cx, cy, h, w = (
        boxes_cxcyhw[..., 0],
        boxes_cxcyhw[..., 1],
        boxes_cxcyhw[..., 2],
        boxes_cxcyhw[..., 3],
    )
    x1 = jnp.clip(jnp.maximum(cx - w / 2, 0.0), None, max_x)
    y1 = jnp.clip(jnp.maximum(cy - h / 2, 0.0), None, max_y)
    x2 = jnp.clip(jnp.minimum(cx + w / 2, w_lim), min_x, None)
    y2 = jnp.clip(jnp.minimum(cy + h / 2, h_lim), min_y, None)
    return jnp.stack(
        [
            jnp.clip((x1 + x2) / 2, 0.0, w_lim),
            jnp.clip((y1 + y2) / 2, 0.0, h_lim),
            jnp.clip(y2 - y1, 0.0, h_lim),
            jnp.clip(x2 - x1, 0.0, w_lim),
        ],
        axis=-1,
    )
