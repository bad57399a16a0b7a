"""Sigmoid focal loss (RetinaNet form) matching the reference numerics.

Reference: misc.py:99-128 — per-element
``alpha_t * BCE(logits, targets) * (1 - p_t)^gamma`` reduced as
``loss.mean(axis=-1).sum() / num_boxes`` (mean over classes, sum over boxes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["sigmoid_focal_loss", "focal_cost_terms"]


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically stable binary cross entropy with logits."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    num_boxes: jnp.ndarray | float,
    alpha: float = 0.25,
    gamma: float = 2.0,
    element_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal loss, mean over the class axis, sum over boxes, / num_boxes.

    Args:
        logits/targets: (..., N, C) — targets are {0, 1} floats.
        num_boxes: normalizer (the reference passes the number of queries;
            criterion.py:47-49).
        element_mask: optional (..., N) bool — rows excluded from the sum
            (static-shape padding support; the reference has no equivalent
            because it slices ragged rows on host).
    """
    prob = jax.nn.sigmoid(logits)
    ce = _bce_with_logits(logits, targets.astype(logits.dtype))
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    per_box = jnp.mean(loss, axis=-1)
    if element_mask is not None:
        per_box = jnp.where(element_mask, per_box, 0.0)
    return jnp.sum(per_box, axis=-1) / num_boxes


def focal_cost_terms(
    probs: jnp.ndarray, alpha: float = 0.25, gamma: float = 2.0, eps: float = 1e-8
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(pos_cost, neg_cost) per class for the Hungarian class cost.

    Mirrors matcher.py:87-93: ``neg = (1-a) p^g (-log(1-p+eps))``,
    ``pos = a (1-p)^g (-log(p+eps))``; the matcher uses
    ``pos[:, tgt] - neg[:, tgt]``.
    """
    neg = (1 - alpha) * probs**gamma * (-jnp.log(1 - probs + eps))
    pos = alpha * (1 - probs) ** gamma * (-jnp.log(probs + eps))
    return pos, neg
