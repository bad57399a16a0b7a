"""SSD-family parity against the actual reference implementation:
SimpleMatcher, SSDLocalCriterion, SSDClassCriterion, and the combined
SSDCriterion (single-image batch, where the reference's last-image-only
class-loss bug — criterion.py:334-335 — is invisible, so values must agree).
"""

import argparse
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "src")), reason="reference not mounted"
)
if REF not in sys.path:
    sys.path.insert(0, REF)

from object_detection_destr_tpu.config import SSDConfig  # noqa: E402
from object_detection_destr_tpu.geometry.boxes import cxcyhw_to_xyxy  # noqa: E402
from object_detection_destr_tpu.losses.criterion import ssd_criterion  # noqa: E402
from object_detection_destr_tpu.losses.matcher import (  # noqa: E402
    decode_ssd_boxes,
    ssd_match,
)
from object_detection_destr_tpu.train.steps import flat_anchors  # noqa: E402

T = lambda a: torch.from_numpy(np.ascontiguousarray(a))

SHAPES = (37, 19, 10, 5, 3, 1)
ANCHORS_PER = (4, 6, 6, 6, 4, 4)
NUM_CLS = 4  # small class count; conf channels = NUM_CLS + 1 (ours)


def _args():
    return argparse.Namespace(scale_min=0.2, scale_max=0.9, device="cpu")


def _per_scale_outputs(rng, b=1, conf_ch=NUM_CLS + 1):
    boxes, conf = [], []
    for s, a in zip(SHAPES, ANCHORS_PER):
        boxes.append(rng.normal(0, 0.1, size=(b, s, s, a, 4)).astype(np.float32))
        conf.append(rng.normal(0, 1.0, size=(b, s, s, a, conf_ch)).astype(np.float32))
    return boxes, conf


def _gt(rng, b=1, t=3):
    return np.stack(
        [
            rng.uniform(0.3, 0.7, size=(b, t)),
            rng.uniform(0.3, 0.7, size=(b, t)),
            rng.uniform(0.1, 0.4, size=(b, t)),
            rng.uniform(0.1, 0.4, size=(b, t)),
        ],
        -1,
    ).astype(np.float32)


def test_anchor_layout_matches_reference():
    """flat_anchors order must equal the reference's per-scale flatten+concat
    (SSDLocalCriterion.__init__, criterion.py:243-247)."""
    from src.utils.criterion import SSDLocalCriterion

    lc = SSDLocalCriterion(_args())
    ref = lc._default_boxes.numpy()  # (S, 4)
    ours = np.asarray(flat_anchors(SSDConfig(num_cls=NUM_CLS)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_simple_matcher_pairs_match_reference():
    from src.utils.matcher import SimpleMatcher

    rng = np.random.default_rng(0)
    b, t = 2, 3
    boxes, _ = _per_scale_outputs(rng, b)
    gt = _gt(rng, b, t)

    matcher = SimpleMatcher(_args())
    ref_pairs, ref_pos, ref_neg = matcher(
        {"boxes": [T(x) for x in boxes]},
        {"boxes": [T(gt[i]) for i in range(b)]},
    )

    anchors = flat_anchors(SSDConfig(num_cls=NUM_CLS))
    flat_boxes = jnp.concatenate(
        [jnp.asarray(x).reshape(b, -1, 4) for x in boxes], axis=1
    )
    decoded = cxcyhw_to_xyxy(decode_ssd_boxes(flat_boxes, anchors))
    gt_xyxy = cxcyhw_to_xyxy(jnp.asarray(gt))
    match, positive = ssd_match(decoded, gt_xyxy, jnp.ones((b, t), bool))
    match, positive = np.asarray(match), np.asarray(positive)

    for i in range(b):
        ref_set = {tuple(p) for p in ref_pairs[i].numpy().tolist()}
        our_set = {(int(s), int(g)) for s, g in zip(*np.nonzero(match[i]))}
        assert our_set == ref_set
        np.testing.assert_array_equal(
            np.sort(ref_pos[i].numpy()), np.nonzero(positive[i])[0]
        )
        np.testing.assert_array_equal(
            np.sort(ref_neg[i].numpy()), np.nonzero(~positive[i])[0]
        )


def test_ssd_criterion_matches_reference_single_image():
    """b=1: the reference's class-loss loop bug is invisible, so the combined
    loss must match ours exactly (REFCOMPAT fix #3)."""
    from src.utils.criterion import SSDClassCriterion, SSDCriterion, SSDLocalCriterion
    from src.utils.matcher import SimpleMatcher

    rng = np.random.default_rng(1)
    b, t = 1, 3
    boxes, conf = _per_scale_outputs(rng, b)
    gt = _gt(rng, b, t)
    labels = rng.integers(0, NUM_CLS, size=(b, t))

    ref_crit = SSDCriterion(
        matcher=SimpleMatcher(_args()),
        loss_fns={"local": SSDLocalCriterion(_args()), "class": SSDClassCriterion()},
        loss_coef=0.5,
    )
    ref_loss = float(
        ref_crit(
            {"boxes": [T(x) for x in boxes], "conf": [T(c) for c in conf]},
            {
                "boxes": [T(gt[i]) for i in range(b)],
                "labels": [torch.from_numpy(labels[i]) for i in range(b)],
            },
        )
    )

    anchors = flat_anchors(SSDConfig(num_cls=NUM_CLS))
    ours = ssd_criterion(
        {
            "boxes": [jnp.asarray(x) for x in boxes],
            "conf": [jnp.asarray(c) for c in conf],
        },
        {
            "boxes": jnp.asarray(gt),
            "labels": jnp.asarray(labels.astype(np.int32)),
            "valid": jnp.ones((b, t), bool),
        },
        anchors,
        loss_coef=0.5,
    )
    np.testing.assert_allclose(float(ours["loss"]), ref_loss, rtol=1e-4)
