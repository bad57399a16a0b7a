"""Inference post-processing tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from object_detection_destr_tpu.config import SSDConfig  # noqa: E402
from object_detection_destr_tpu.infer.predict import destr_predict, ssd_predict  # noqa: E402
from object_detection_destr_tpu.train.steps import flat_anchors  # noqa: E402


def test_destr_predict_thresholds_and_sorts():
    logits = np.full((1, 6, 2), -4.0, np.float32)
    logits[0, 0, 0] = 3.0  # strong face
    logits[0, 3, 0] = 1.0  # weak face
    boxes = np.tile(np.asarray([0.5, 0.5, 0.2, 0.2], np.float32), (1, 6, 1))
    out = destr_predict(
        {"pred_class": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)},
        score_thresh=0.5,
    )
    valid = np.asarray(out["valid"])[0]
    scores = np.asarray(out["scores"])[0]
    assert valid[0] and valid[1]  # two above-threshold dets, sorted first
    assert not valid[2:].any()
    assert scores[0] > scores[1]
    assert np.asarray(out["boxes"]).shape[-1] == 4


def test_ssd_predict_shapes_and_suppression():
    cfg = SSDConfig(num_cls=3, feature_shapes=(2, 1), anchors_per_scale=(4, 4),
                    aspect_ratios=((2,), (2,)))
    anchors = flat_anchors(cfg)
    s = anchors.shape[0]
    b = 2
    # craft flat outputs then reshape into the per-scale list layout
    rng = np.random.default_rng(0)
    per_scale_boxes, per_scale_conf = [], []
    offset = 0
    for shape, a in zip(cfg.feature_shapes, cfg.anchors_per_scale):
        n = shape * shape * a
        per_scale_boxes.append(
            jnp.asarray(rng.normal(0, 0.05, size=(b, shape, shape, a, 4)).astype(np.float32))
        )
        conf = np.full((b, shape, shape, a, cfg.num_cls + 1), -3.0, np.float32)
        per_scale_conf.append(jnp.asarray(conf))
        offset += n
    outputs = {"boxes": per_scale_boxes, "conf": per_scale_conf}
    out = ssd_predict(outputs, anchors, score_thresh=0.5, max_dets=s)
    assert out["boxes"].shape == (b, s, 4)
    assert out["valid"].shape == (b, s)
    # uniform low confidence -> nothing above the 0.5 score threshold
    assert not np.asarray(out["valid"]).any()


def test_ssd_predict_keeps_best_of_overlapping():
    cfg = SSDConfig(num_cls=2, feature_shapes=(2, 1), anchors_per_scale=(4, 4),
                    aspect_ratios=((2,), (2,)))
    anchors = flat_anchors(cfg)
    s = anchors.shape[0]
    boxes = [jnp.zeros((1, 2, 2, 4, 4), jnp.float32), jnp.zeros((1, 1, 1, 4, 4), jnp.float32)]
    conf0 = np.full((1, 2, 2, 4, 3), -5.0, np.float32)
    # two anchors in the same cell (same center, similar size) both confident
    conf0[0, 0, 0, 0, 0] = 4.0
    conf0[0, 0, 0, 1, 0] = 3.0
    conf1 = np.full((1, 1, 1, 4, 3), -5.0, np.float32)
    out = ssd_predict(
        {"boxes": boxes, "conf": [jnp.asarray(conf0), jnp.asarray(conf1)]},
        anchors,
        score_thresh=0.5,
        iou_thresh=0.5,
        max_dets=s,
    )
    valid = np.asarray(out["valid"])[0]
    scores = np.asarray(out["scores"])[0]
    # the weaker overlapping detection must be suppressed iff IoU >= 0.5;
    # anchor 0 is (s,s), anchor 1 is (sqrt(s s'),...) same center -> IoU > 0.5
    assert valid[0] and scores[0] > 0.9
    assert not valid[1]
