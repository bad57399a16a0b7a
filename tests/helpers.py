"""Shared numpy helpers for loss/matcher/metric tests."""

import numpy as np
import jax.numpy as jnp


def _np_cxcyhw_to_xyxy(b):
    cx, cy, h, w = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack(
        [
            np.maximum(cx - w / 2, 0.0),
            np.maximum(cy - h / 2, 0.0),
            np.minimum(cx + w / 2, 1.0),
            np.minimum(cy + h / 2, 1.0),
        ],
        -1,
    )


def _random_problem(rng, b=3, n=40, t=7):
    logits = rng.normal(size=(b, n, 2)).astype(np.float32)
    boxes = np.stack(
        [
            rng.uniform(0.2, 0.8, size=(b, n)),
            rng.uniform(0.2, 0.8, size=(b, n)),
            rng.uniform(0.05, 0.4, size=(b, n)),
            rng.uniform(0.05, 0.4, size=(b, n)),
        ],
        -1,
    ).astype(np.float32)
    gt_c = np.stack(
        [
            rng.uniform(0.2, 0.8, size=(b, t)),
            rng.uniform(0.2, 0.8, size=(b, t)),
            rng.uniform(0.05, 0.4, size=(b, t)),
            rng.uniform(0.05, 0.4, size=(b, t)),
        ],
        -1,
    ).astype(np.float32)
    gt_xyxy = _np_cxcyhw_to_xyxy(gt_c)
    labels = np.zeros((b, t), np.int32)
    valid = np.ones((b, t), bool)
    valid[0, t - 2 :] = False  # one image with padded targets
    outputs = {"pred_class": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)}
    targets = {
        "boxes": jnp.asarray(gt_xyxy),
        "labels": jnp.asarray(labels),
        "valid": jnp.asarray(valid),
    }
    return outputs, targets
