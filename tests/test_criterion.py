"""Criterion tests: set_criterion vs a literal numpy re-derivation of the
reference per-image recipe (criterion.py:15-79), SSD criterion hand checks,
and gradient sanity."""

import numpy as np
import pytest
import scipy.optimize

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from object_detection_destr_tpu.geometry.boxes import (  # noqa: E402
    cxcyhw_to_xyxy,
    elementwise_ciou,
)
from object_detection_destr_tpu.losses.criterion import (  # noqa: E402
    set_criterion,
    ssd_criterion,
)
from object_detection_destr_tpu.losses.matcher import hungarian_cost_matrix  # noqa: E402

from helpers import _np_cxcyhw_to_xyxy, _random_problem  # noqa: E402


def _np_focal(logits, one_hot, num_boxes, alpha=0.25, gamma=2.0):
    prob = 1.0 / (1.0 + np.exp(-logits))
    ce = np.maximum(logits, 0) - logits * one_hot + np.log1p(np.exp(-np.abs(logits)))
    p_t = prob * one_hot + (1 - prob) * (1 - one_hot)
    loss = ce * (1 - p_t) ** gamma
    alpha_t = alpha * one_hot + (1 - alpha) * (1 - one_hot)
    loss = alpha_t * loss
    return loss.mean(-1).sum() / num_boxes


def test_set_criterion_matches_reference_recipe():
    rng = np.random.default_rng(7)
    outputs, targets = _random_problem(rng, b=3, n=30, t=6)

    cost = np.asarray(hungarian_cost_matrix(outputs, targets))
    valid = np.asarray(targets["valid"])
    labels = np.asarray(targets["labels"])
    t_pad = valid.shape[1]
    n = cost.shape[1]

    # scipy assignment, padded back to (B, T) row vector
    rows = np.zeros(valid.shape, np.int32)
    for b in range(cost.shape[0]):
        t_idx = np.where(valid[b])[0]
        ri, ci = scipy.optimize.linear_sum_assignment(cost[b][:, t_idx])
        rows[b][t_idx[ci]] = ri
        free = [i for i in range(n) if i not in set(ri)]
        pad_cols = [j for j in range(t_pad) if j not in t_idx]
        rows[b][pad_cols] = free[: len(pad_cols)]

    losses = jax.tree.map(
        np.asarray,
        set_criterion(outputs, targets, rows=jnp.asarray(rows)),
    )

    # ---- golden numpy re-derivation, per image ----
    logits = np.asarray(outputs["pred_class"])
    pred_xyxy = np.asarray(cxcyhw_to_xyxy(outputs["pred_boxes"]))
    gt = np.asarray(targets["boxes"])

    class_l, bbox_l, ciou_l = [], [], []
    for b in range(cost.shape[0]):
        t_idx = np.where(valid[b])[0]
        r = rows[b][t_idx]
        # class: matched queries get gt label, all others background (=1)
        query_labels = np.ones((n,), np.int64)
        query_labels[r] = labels[b][t_idx]
        one_hot = np.eye(2)[query_labels]
        class_l.append(_np_focal(logits[b], one_hot, n))
        if len(t_idx):
            mp = pred_xyxy[b][r]
            mg = gt[b][t_idx]
            bbox_l.append(np.abs(mp - mg).mean())
            ciou_l.append(
                np.asarray(
                    elementwise_ciou(jnp.asarray(mp), jnp.asarray(mg))
                ).mean()
            )
    np.testing.assert_allclose(losses["class"], np.mean(class_l), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(losses["bbox"], np.mean(bbox_l), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(losses["ciou"], np.mean(ciou_l), rtol=1e-4, atol=1e-5)


def test_set_criterion_no_targets_image():
    rng = np.random.default_rng(8)
    outputs, targets = _random_problem(rng, b=2, n=20, t=5)
    targets = dict(targets)
    valid = np.asarray(targets["valid"]).copy()
    valid[0] = False  # image 0 has no GTs at all
    targets["valid"] = jnp.asarray(valid)
    losses = set_criterion(outputs, targets)
    for v in losses.values():
        assert np.isfinite(np.asarray(v))


def test_set_criterion_reference_ciou_mode():
    rng = np.random.default_rng(9)
    outputs, targets = _random_problem(rng, b=2, n=25, t=4)
    a = set_criterion(outputs, targets, ciou_mode="elementwise")
    b = set_criterion(outputs, targets, ciou_mode="reference")
    # pairwise-mean includes off-diagonal (mismatched) pairs -> larger loss
    assert float(b["ciou"]) > float(a["ciou"])


def _tiny_ssd_problem(rng, b=2, t=3, num_cls=4):
    shapes = {"boxes": [], "conf": []}
    grids = [(4, 2), (2, 2)]  # 2 scales, A anchors
    total = 0
    for g, a in grids:
        shapes["boxes"].append(
            jnp.asarray(rng.normal(0, 0.1, size=(b, g, g, a, 4)).astype(np.float32))
        )
        shapes["conf"].append(
            jnp.asarray(
                rng.normal(0, 1.0, size=(b, g, g, a, num_cls + 1)).astype(np.float32)
            )
        )
        total += g * g * a
    anchors = np.stack(
        [
            rng.uniform(0.2, 0.8, size=total),
            rng.uniform(0.2, 0.8, size=total),
            rng.uniform(0.1, 0.4, size=total),
            rng.uniform(0.1, 0.4, size=total),
        ],
        -1,
    ).astype(np.float32)
    gt = np.stack(
        [
            rng.uniform(0.3, 0.7, size=(b, t)),
            rng.uniform(0.3, 0.7, size=(b, t)),
            rng.uniform(0.1, 0.4, size=(b, t)),
            rng.uniform(0.1, 0.4, size=(b, t)),
        ],
        -1,
    ).astype(np.float32)
    valid = np.ones((b, t), bool)
    valid[0, -1] = False
    targets = {
        "boxes": jnp.asarray(gt),
        "labels": jnp.asarray(rng.integers(0, num_cls, size=(b, t)), dtype=jnp.int32),
        "valid": jnp.asarray(valid),
    }
    return shapes, targets, jnp.asarray(anchors)


def test_ssd_criterion_finite_and_blend():
    rng = np.random.default_rng(11)
    outputs, targets, anchors = _tiny_ssd_problem(rng)
    losses = ssd_criterion(outputs, targets, anchors, loss_coef=0.5)
    for v in losses.values():
        assert np.isfinite(np.asarray(v))
    np.testing.assert_allclose(
        np.asarray(losses["loss"]),
        0.5 * np.asarray(losses["class"]) + 0.5 * np.asarray(losses["local"]),
        rtol=1e-6,
    )


def test_ssd_criterion_every_image_contributes():
    """The reference's class loss only counts the last image
    (criterion.py:334-335); ours must change when image 0 changes."""
    rng = np.random.default_rng(12)
    outputs, targets, anchors = _tiny_ssd_problem(rng)
    base = float(ssd_criterion(outputs, targets, anchors)["class"])
    # shift only the background channel of image 0 (a uniform shift over all
    # channels would leave the softmax invariant)
    perturbed = {
        "boxes": outputs["boxes"],
        "conf": [c.at[0, ..., -1].add(1.0) for c in outputs["conf"]],
    }
    new = float(ssd_criterion(perturbed, targets, anchors)["class"])
    assert new != base


def test_ssd_criterion_grads_finite():
    rng = np.random.default_rng(13)
    outputs, targets, anchors = _tiny_ssd_problem(rng)

    def loss_fn(outs):
        return ssd_criterion(outs, targets, anchors)["loss"]

    grads = jax.grad(loss_fn)(outputs)
    for g in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))


def test_set_criterion_grads_finite():
    rng = np.random.default_rng(14)
    outputs, targets = _random_problem(rng, b=2, n=20, t=5)

    def loss_fn(outs):
        l = set_criterion(outs, targets)
        return l["class"] + l["bbox"] + l["ciou"]

    grads = jax.grad(loss_fn)(dict(outputs))
    for g in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))


def test_ssd_mining_paper_selects_hardest_negatives():
    """REFCOMPAT configurable quirk #5: "paper" keeps the lowest-background-
    confidence negatives, "reference" the highest. On a problem where some
    negatives have near-zero background confidence, the paper-mode class loss
    must be strictly larger (it sums the most-negative background log-probs),
    and a brute-force recomputation of both selections must agree."""
    rng = np.random.default_rng(14)
    outputs, targets, anchors = _tiny_ssd_problem(rng)
    # spread background confidence wide so the two directions differ sharply
    outputs = {
        "boxes": outputs["boxes"],
        "conf": [
            c.at[..., -1].add(
                jnp.asarray(rng.normal(scale=4.0, size=c.shape[:-1]), jnp.float32)
            )
            for c in outputs["conf"]
        ],
    }
    ref = float(ssd_criterion(outputs, targets, anchors, mining="reference")["class"])
    pap = float(ssd_criterion(outputs, targets, anchors, mining="paper")["class"])
    assert np.isfinite(ref) and np.isfinite(pap)
    assert pap > ref  # hardest negatives carry more loss than easiest

    # brute-force both selections from the flat log-softmax
    import scipy.special  # noqa: F401  (numpy-only below; keep import-free)
    from object_detection_destr_tpu.geometry.boxes import cxcyhw_to_xyxy
    from object_detection_destr_tpu.losses.matcher import decode_ssd_boxes, ssd_match

    flat_conf = np.concatenate(
        [np.asarray(c).reshape(c.shape[0], -1, c.shape[-1]) for c in outputs["conf"]],
        axis=1,
    )
    flat_boxes = np.concatenate(
        [np.asarray(bx).reshape(bx.shape[0], -1, 4) for bx in outputs["boxes"]], axis=1
    )
    decoded = cxcyhw_to_xyxy(decode_ssd_boxes(jnp.asarray(flat_boxes), anchors))
    match, positive = ssd_match(
        decoded, cxcyhw_to_xyxy(targets["boxes"]), targets["valid"], 0.5
    )
    match, positive = np.asarray(match), np.asarray(positive)
    logz = flat_conf - scipy.special.logsumexp(flat_conf, axis=-1, keepdims=True)
    for mode, got in (("reference", ref), ("paper", pap)):
        per_img = []
        for i in range(flat_conf.shape[0]):
            pos_ll = sum(  # match is (B, S, T): anchor-major
                logz[i, s, targets["labels"][i, t]]
                for s in range(match.shape[1])
                for t in range(match.shape[2])
                if match[i, s, t]
            )
            neg_bg = np.sort(logz[i, ~positive[i], -1])
            n_keep = min(3 * int(positive[i].sum()), neg_bg.size)
            kept = neg_bg[:n_keep] if mode == "paper" else neg_bg[::-1][:n_keep]
            per_img.append(-(pos_ll + kept.sum()))
        np.testing.assert_allclose(np.mean(per_img), got, rtol=2e-5)


def test_set_criterion_more_targets_than_rows():
    """T_valid > N: the stacked/padded assignment parks overflow targets on
    padding rows (rows >= N). They must drop from the box losses — with no
    guard the out-of-range gather fills NaN under jit (the 96px/top_k-4
    harness NaN). Mirrors scipy's rectangular-assignment semantics: only
    min(N, T_valid) pairs exist."""
    rng = np.random.default_rng(11)
    outputs, targets = _random_problem(rng, b=2, n=3, t=6)  # 6 valid GTs, 3 rows

    # assignment as the padded two-problem solve produces it: 3 real rows,
    # 3 overflow targets pointing past N
    rows = jnp.asarray([[0, 2, 1, 5, 7, 6], [2, 0, 1, 4, 3, 5]], jnp.int32)
    losses = jax.jit(lambda o, t: set_criterion(o, t, rows=rows))(outputs, targets)
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)), k

    # equality with the criterion restricted to the matchable subset:
    # keep the 3 matched targets only, shrink T, same rows
    sub_targets = {
        "boxes": targets["boxes"][:, :3],
        "labels": targets["labels"][:, :3],
        "valid": targets["valid"][:, :3],
    }
    sub = set_criterion(outputs, sub_targets, rows=rows[:, :3])
    np.testing.assert_allclose(
        np.asarray(losses["bbox"]), np.asarray(sub["bbox"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(losses["ciou"]), np.asarray(sub["ciou"]), rtol=1e-6
    )


def test_set_criterion_class_norm_boxes():
    """class_norm="boxes" rescales each image's focal sum by n/num_gt
    relative to the reference's query normalization (REFCOMPAT
    "class-loss normalization"); bbox/ciou are untouched."""
    from object_detection_destr_tpu.losses.matcher import hungarian_match

    rng = np.random.default_rng(11)
    outputs, targets = _random_problem(rng, b=3, n=30, t=6)
    valid = np.asarray(targets["valid"])
    n = np.asarray(outputs["pred_class"]).shape[1]

    rows = hungarian_match(outputs, targets)  # shared assignment
    lq = set_criterion(outputs, targets, rows=rows)
    lb = set_criterion(outputs, targets, rows=rows, class_norm="boxes")
    np.testing.assert_allclose(np.asarray(lq["bbox"]), np.asarray(lb["bbox"]))
    np.testing.assert_allclose(np.asarray(lq["ciou"]), np.asarray(lb["ciou"]))
    # scale check on the batch mean: sum_i (s_i / n) vs sum_i (s_i / g_i)
    # with equal g_i the ratio is exactly n / g
    g = np.maximum(valid.sum(-1), 1)
    if np.all(g == g[0]):
        np.testing.assert_allclose(
            np.asarray(lb["class"]), np.asarray(lq["class"]) * n / g[0], rtol=1e-5
        )
    else:
        assert float(lb["class"]) > float(lq["class"])  # strictly stronger
