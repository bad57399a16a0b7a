"""Golden-value tests for the geometry layer.

Golden values are produced by independent numpy re-derivations of the
reference semantics (documented per-function in geometry/boxes.py with
reference file:line cites), plus hand-computed cases.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from object_detection_destr_tpu.geometry import (
    box_l1_size,
    cxcyhw_to_xyxy,
    default_boxes,
    elementwise_ciou,
    elementwise_iou,
    flat_box_mask,
    inverse_sigmoid,
    make_grid,
    pairwise_ciou,
    pairwise_iou,
    sine_embed_centers,
    sine_position_map,
    xywh_to_xyxy,
    xyxy_to_cxcyhw,
)


def test_cxcyhw_roundtrip():
    # (cx, cy, h, w) — h before w
    boxes = jnp.array([[0.5, 0.5, 0.2, 0.4], [0.1, 0.9, 0.3, 0.1]])
    xyxy = cxcyhw_to_xyxy(boxes)
    np.testing.assert_allclose(
        np.asarray(xyxy),
        np.array([[0.3, 0.4, 0.7, 0.6], [0.05, 0.75, 0.15, 1.0]]),
        atol=1e-6,
    )
    back = xyxy_to_cxcyhw(xyxy)
    # second box is clipped at y=1 so cy/h change; first roundtrips exactly
    np.testing.assert_allclose(np.asarray(back[0]), np.asarray(boxes[0]), atol=1e-6)


def test_cxcyhw_to_xyxy_clips():
    boxes = jnp.array([[0.05, 0.5, 0.2, 0.4]])  # x1 would be -0.15
    xyxy = cxcyhw_to_xyxy(boxes)
    assert float(xyxy[0, 0]) == 0.0
    assert float(xyxy[0, 2]) == pytest.approx(0.25)


def test_xywh_to_xyxy():
    boxes = jnp.array([[0.1, 0.2, 0.3, 0.4]])
    out = xywh_to_xyxy(boxes)
    np.testing.assert_allclose(np.asarray(out), np.array([[0.1, 0.2, 0.4, 0.6]]), atol=1e-6)


def test_pairwise_iou_golden():
    a = jnp.array([[0.0, 0.0, 0.5, 0.5], [0.5, 0.5, 1.0, 1.0]])
    b = jnp.array([[0.0, 0.0, 0.5, 0.5], [0.25, 0.25, 0.75, 0.75]])
    iou = pairwise_iou(a, b)
    # a0 vs b0: identical -> 1. a0 vs b1: inter .0625, union .4375
    np.testing.assert_allclose(
        np.asarray(iou),
        np.array([[1.0, 0.0625 / 0.4375], [0.0, 0.0625 / 0.4375]]),
        atol=1e-5,
    )


def test_pairwise_iou_batched():
    a = jnp.ones((3, 5, 4)) * jnp.array([0.0, 0.0, 1.0, 1.0])
    b = jnp.ones((3, 7, 4)) * jnp.array([0.0, 0.0, 1.0, 1.0])
    assert pairwise_iou(a, b).shape == (3, 5, 7)


def _ciou_numpy(pred, gt, epsilon=1e-6):
    """Independent numpy re-derivation of reference complete_iou (bbox_utils.py:160-198)."""
    pred, gt = np.asarray(pred, np.float64), np.asarray(gt, np.float64)

    def to_c(b):
        x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
        c = lambda v: np.clip(v, 0, 1)
        return np.stack([c((x1 + x2) / 2), c((y1 + y2) / 2), c(y2 - y1), c(x2 - x1)], -1)

    pc, gc = to_c(pred), to_c(gt)
    n, m = pred.shape[0], gt.shape[0]
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            ix1 = max(pred[i, 0], gt[j, 0]); iy1 = max(pred[i, 1], gt[j, 1])
            ix2 = min(pred[i, 2], gt[j, 2]); iy2 = min(pred[i, 3], gt[j, 3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            a1 = (pred[i, 2] - pred[i, 0]) * (pred[i, 3] - pred[i, 1])
            a2 = (gt[j, 2] - gt[j, 0]) * (gt[j, 3] - gt[j, 1])
            iou = inter / max(a1 + a2 - inter, epsilon)
            ew = max(pred[i, 2], gt[j, 2]) - min(pred[i, 0], gt[j, 0])
            eh = max(pred[i, 3], gt[j, 3]) - min(pred[i, 1], gt[j, 1])
            diag = max(ew, 0) ** 2 + max(eh, 0) ** 2
            cd = (pc[i, 0] - gc[j, 0]) ** 2 + (pc[i, 1] - gc[j, 1]) ** 2
            v = (4 / math.pi**2) * (
                math.atan(gc[j, 3] / max(gc[j, 2], epsilon))
                - math.atan(pc[i, 3] / max(pc[i, 2], epsilon))
            ) ** 2
            alpha = (iou > 0.5) * (v / (1 - iou + v))
            ciou = iou - cd / max(diag, epsilon) - alpha * v
            out[i, j] = 1 - np.clip(ciou, -1, 1)
    return out


def test_pairwise_ciou_vs_numpy():
    rng = np.random.default_rng(0)
    pred = np.sort(rng.uniform(0, 1, (6, 2, 2)), axis=1).reshape(6, 4)[:, [0, 2, 1, 3]]
    gt = np.sort(rng.uniform(0, 1, (4, 2, 2)), axis=1).reshape(4, 4)[:, [0, 2, 1, 3]]
    # rearrange into valid xyxy (x1<x2, y1<y2)
    pred = np.stack([np.minimum(pred[:, 0], pred[:, 2]), np.minimum(pred[:, 1], pred[:, 3]),
                     np.maximum(pred[:, 0], pred[:, 2]) + 0.01, np.maximum(pred[:, 1], pred[:, 3]) + 0.01], -1)
    gt = np.stack([np.minimum(gt[:, 0], gt[:, 2]), np.minimum(gt[:, 1], gt[:, 3]),
                   np.maximum(gt[:, 0], gt[:, 2]) + 0.01, np.maximum(gt[:, 1], gt[:, 3]) + 0.01], -1)
    got = np.asarray(pairwise_ciou(jnp.asarray(pred, jnp.float32), jnp.asarray(gt, jnp.float32)))
    want = _ciou_numpy(pred, gt)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_elementwise_matches_pairwise_diag():
    rng = np.random.default_rng(1)
    lo = rng.uniform(0, 0.5, (5, 2))
    hi = lo + rng.uniform(0.05, 0.5, (5, 2))
    a = jnp.asarray(np.concatenate([lo, hi], -1), jnp.float32)
    lo2 = rng.uniform(0, 0.5, (5, 2))
    hi2 = lo2 + rng.uniform(0.05, 0.5, (5, 2))
    b = jnp.asarray(np.concatenate([lo2, hi2], -1), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(elementwise_iou(a, b)), np.diag(np.asarray(pairwise_iou(a, b))), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(elementwise_ciou(a, b)), np.diag(np.asarray(pairwise_ciou(a, b))), atol=1e-5
    )


def test_flat_box_mask_and_l1():
    boxes = jnp.array([[0.1, 0.1, 0.3, 0.4], [0.2, 0.2, 0.2, 0.5]])
    mask = flat_box_mask(boxes)
    assert bool(mask[0]) and not bool(mask[1])
    np.testing.assert_allclose(np.asarray(box_l1_size(boxes)), [0.5, 0.3], atol=1e-6)


def test_make_grid():
    g = make_grid(2, 4)
    assert g.shape == (2, 4, 2)
    np.testing.assert_allclose(np.asarray(g[0, 0]), [0.25, 0.125], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g[1, 3]), [0.75, 0.875], atol=1e-6)


def test_default_boxes_shapes_and_values():
    scales = [0.2, 0.34, 0.48, 0.62, 0.76, 0.9, 1.04]
    ars = [[2], [2, 3], [2, 3], [2, 3], [2], [2]]
    dbs = default_boxes([37, 19, 10, 5, 3, 1], scales, ars)
    assert [d.shape for d in dbs] == [
        (37, 37, 4, 4), (19, 19, 6, 4), (10, 10, 6, 4), (5, 5, 6, 4), (3, 3, 4, 4), (1, 1, 4, 4)
    ]
    # first cell of first scale: center (0.5/37, 0.5/37), anchor 0 hw = (0.2, 0.2)
    d0 = np.asarray(dbs[0][0, 0, 0])
    np.testing.assert_allclose(d0, [0.5 / 37, 0.5 / 37, 0.2, 0.2], atol=1e-6)
    # anchor 2 of scale 0 (ar=2): (s*sqrt2, s/sqrt2)
    d2 = np.asarray(dbs[0][0, 0, 2])
    np.testing.assert_allclose(d2[2:], [0.2 * math.sqrt(2), 0.2 / math.sqrt(2)], atol=1e-6)


def test_sine_position_map_golden():
    # all-valid 2x3 map, num_pos_feats=2 -> 4 channels
    mask = jnp.ones((1, 2, 3), bool)
    pos = sine_position_map(mask, num_pos_feats=2)
    assert pos.shape == (1, 2, 3, 4)
    # y_embed normalized: row0 -> 1/(2+eps)*2pi, row1 -> 2pi
    scale = 2 * math.pi
    y0 = 1.0 / (2 + 1e-6) * scale
    # channel 0 = sin(y0 / T^0) = sin(y0); channel 1 = cos(y0 / T^(2*... ) )
    np.testing.assert_allclose(float(pos[0, 0, 0, 0]), math.sin(y0), atol=1e-5)
    x0 = 1.0 / (3 + 1e-6) * scale
    np.testing.assert_allclose(float(pos[0, 0, 0, 2]), math.sin(x0), atol=1e-5)


def test_sine_position_map_respects_mask():
    mask = jnp.ones((1, 4, 4), bool).at[:, :, 2:].set(False)
    pos = sine_position_map(mask, num_pos_feats=4)
    # cumsum stops increasing in padded region -> x embed saturates
    assert np.allclose(np.asarray(pos[0, 0, 2]), np.asarray(pos[0, 0, 3]), atol=1e-6)


def test_sine_embed_centers_golden():
    centers = jnp.array([[[0.25, 0.75]]])  # (1, 1, 2)
    d = 8
    out = sine_embed_centers(centers, d_model=d)
    assert out.shape == (1, 1, 8)
    scale = 2 * math.pi
    half = d // 2
    dim_t = 10000.0 ** (2 * (np.arange(half) // 2) / half)
    x, y = 0.25 * scale, 0.75 * scale
    want_y = np.stack([np.sin((y / dim_t)[0::2]), np.cos((y / dim_t)[1::2])], -1).reshape(-1)
    want_x = np.stack([np.sin((x / dim_t)[0::2]), np.cos((x / dim_t)[1::2])], -1).reshape(-1)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.concatenate([want_y, want_x]), atol=1e-5)


def test_inverse_sigmoid():
    x = jnp.array([0.5, 0.1, 0.9])
    out = inverse_sigmoid(x)
    np.testing.assert_allclose(np.asarray(out), [0.0, -math.log(9), math.log(9)], atol=1e-4)
    # sigmoid(inverse_sigmoid(x)) == x
    np.testing.assert_allclose(np.asarray(1 / (1 + np.exp(-np.asarray(out)))), np.asarray(x), atol=1e-5)
