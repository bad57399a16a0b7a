"""Matcher tests: cost-matrix numerics vs numpy, auction vs scipy parity,
SSD match matrix vs a literal per-image re-derivation of the reference rule
(matcher.py:253-281)."""

import numpy as np
import pytest
import scipy.optimize

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from object_detection_destr_tpu.losses.matcher import (  # noqa: E402
    decode_ssd_boxes,
    hungarian_cost_matrix,
    hungarian_match,
    ssd_match,
)
from helpers import _np_cxcyhw_to_xyxy, _random_problem  # noqa: E402


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_class_cost_matches_numpy():
    rng = np.random.default_rng(0)
    outputs, targets = _random_problem(rng)
    cost = np.asarray(
        hungarian_cost_matrix(outputs, targets, cost_class=1.0, cost_bbox=0.0, cost_ciou=0.0)
    )
    probs = _np_sigmoid(np.asarray(outputs["pred_class"]))
    alpha, gamma = 0.25, 2.0
    neg = (1 - alpha) * probs**gamma * (-np.log(1 - probs + 1e-8))
    pos = alpha * (1 - probs) ** gamma * (-np.log(probs + 1e-8))
    labels = np.asarray(targets["labels"])
    for b in range(cost.shape[0]):
        expected = pos[b][:, labels[b]] - neg[b][:, labels[b]]
        np.testing.assert_allclose(cost[b], expected, rtol=1e-5, atol=1e-6)


def test_hungarian_match_total_cost_parity_with_scipy():
    rng = np.random.default_rng(1)
    outputs, targets = _random_problem(rng, b=4, n=60, t=9)
    cost = np.asarray(hungarian_cost_matrix(outputs, targets))
    rows = np.asarray(hungarian_match(outputs, targets))
    valid = np.asarray(targets["valid"])
    for b in range(cost.shape[0]):
        t_idx = np.where(valid[b])[0]
        c = cost[b][:, t_idx]
        ri, ci = scipy.optimize.linear_sum_assignment(c)
        scipy_cost = c[ri, ci].sum()
        ours = cost[b][rows[b][t_idx], t_idx].sum()
        # auction is eps-optimal: allow a small relative slack
        denom = max(abs(scipy_cost), 1e-6)
        assert (ours - scipy_cost) / denom < 5e-3
        # duplicate-free over valid targets
        assert len(np.unique(rows[b][t_idx])) == len(t_idx)


def test_ssd_match_matches_reference_rule():
    rng = np.random.default_rng(2)
    b, s, t = 2, 50, 6
    pred = np.stack(
        [
            rng.uniform(0.1, 0.9, size=(b, s)),
            rng.uniform(0.1, 0.9, size=(b, s)),
            rng.uniform(0.05, 0.5, size=(b, s)),
            rng.uniform(0.05, 0.5, size=(b, s)),
        ],
        -1,
    ).astype(np.float32)
    gt = np.stack(
        [
            rng.uniform(0.1, 0.9, size=(b, t)),
            rng.uniform(0.1, 0.9, size=(b, t)),
            rng.uniform(0.05, 0.5, size=(b, t)),
            rng.uniform(0.05, 0.5, size=(b, t)),
        ],
        -1,
    ).astype(np.float32)
    pred_xyxy = _np_cxcyhw_to_xyxy(pred)
    gt_xyxy = _np_cxcyhw_to_xyxy(gt)
    valid = np.ones((b, t), bool)
    valid[1, -1] = False

    match, positive = ssd_match(
        jnp.asarray(pred_xyxy), jnp.asarray(gt_xyxy), jnp.asarray(valid)
    )
    match, positive = np.asarray(match), np.asarray(positive)

    def np_iou(a, c):
        mins = np.maximum(a[:, None, :2], c[None, :, :2])
        maxs = np.minimum(a[:, None, 2:], c[None, :, 2:])
        wh = np.maximum(maxs - mins, 0.0)
        inter = wh[..., 0] * wh[..., 1]
        area = lambda x: (x[..., 2] - x[..., 0]) * (x[..., 3] - x[..., 1])
        return inter / np.maximum(area(a)[:, None] + area(c)[None] - inter, 1e-6)

    for bi in range(b):
        tv = np.where(valid[bi])[0]
        ious = np_iou(pred_xyxy[bi], gt_xyxy[bi][tv])
        expected = np.zeros((s, t), bool)
        best = np.argmax(ious, axis=0)
        for j_local, j in enumerate(tv):
            expected[best[j_local], j] = True
            ious[best[j_local], j_local] = 0.0
        iy, ix = np.where(ious >= 0.5)
        expected[iy, tv[ix]] = True
        np.testing.assert_array_equal(match[bi], expected)
        np.testing.assert_array_equal(positive[bi], expected.any(-1))


def test_decode_ssd_boxes():
    rng = np.random.default_rng(3)
    anchors = np.abs(rng.normal(0.4, 0.1, size=(12, 4))).astype(np.float32)
    preds = rng.normal(0, 0.1, size=(2, 12, 4)).astype(np.float32)
    out = np.asarray(decode_ssd_boxes(jnp.asarray(preds), jnp.asarray(anchors)))
    expected = np.stack(
        [
            anchors[None, :, 0] + anchors[None, :, 3] * preds[..., 0],
            anchors[None, :, 1] + anchors[None, :, 2] * preds[..., 1],
            anchors[None, :, 2] * np.exp(preds[..., 2]),
            anchors[None, :, 3] * np.exp(preds[..., 3]),
        ],
        -1,
    )
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)
