"""Tests for ops: attention, top-k recycling, focal loss, NMS."""

import jax
import jax.numpy as jnp
import numpy as np

from object_detection_destr_tpu.ops import (
    masked_topk_with_recycle,
    multi_head_attention,
    nms_greedy,
    nms_triangular,
    scaled_dot_product_attention,
    sigmoid_focal_loss,
    split_heads,
)


class TestAttention:
    def test_matches_manual_softmax(self):
        rng = np.random.default_rng(0)
        b, h, s, d = 2, 4, 6, 8
        q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
        out = scaled_dot_product_attention(q, k, v)
        logits = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        want = np.einsum("bhqk,bhkv->bhqv", probs, v).transpose(0, 2, 1, 3).reshape(b, s, h * d)
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)

    def test_key_padding_mask(self):
        rng = np.random.default_rng(1)
        b, s, dm = 2, 8, 16
        q = jnp.asarray(rng.normal(size=(b, s, dm)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, s, dm)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, s, dm)), jnp.float32)
        valid = jnp.ones((b, s), bool).at[:, 5:].set(False)
        out = multi_head_attention(q, k, v, num_heads=4, key_valid_mask=valid)
        # perturbing masked keys/values must not change the output
        k2 = k.at[:, 5:].add(100.0)
        v2 = v.at[:, 5:].add(100.0)
        out2 = multi_head_attention(q, k2, v2, num_heads=4, key_valid_mask=valid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)

    def test_dropout_train_vs_eval(self):
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(1, 2, 4, 8)), jnp.float32)
        out_eval = scaled_dot_product_attention(q, q, q, dropout_rate=0.5, dropout_rng=None)
        out_train = scaled_dot_product_attention(
            q, q, q, dropout_rate=0.5, dropout_rng=jax.random.key(0)
        )
        assert not np.allclose(np.asarray(out_eval), np.asarray(out_train))

    def test_split_heads_layout(self):
        x = jnp.arange(2 * 3 * 8).reshape(2, 3, 8).astype(jnp.float32)
        sh = split_heads(x, 2)
        assert sh.shape == (2, 2, 3, 4)
        np.testing.assert_array_equal(np.asarray(sh[0, 0, 0]), np.asarray(x[0, 0, :4]))
        np.testing.assert_array_equal(np.asarray(sh[0, 1, 0]), np.asarray(x[0, 0, 4:]))


class TestTopK:
    def test_plain_topk_when_enough_valid(self):
        scores = jnp.asarray([[0.1, 0.9, 0.5, 0.7]])
        valid = jnp.ones((1, 4), bool)
        idx = masked_topk_with_recycle(scores, 3, valid)
        np.testing.assert_array_equal(np.asarray(idx[0]), [1, 3, 2])

    def test_recycles_when_short(self):
        # 2 valid tokens, k=5: slots = [i0, i1, then recycle v-1-(i%v)]
        scores = jnp.asarray([[0.9, 0.5, 0.0, 0.0]])
        valid = jnp.asarray([[True, True, False, False]])
        idx = np.asarray(masked_topk_with_recycle(scores, 4, valid)[0])
        # topk of valid = [0, 1]; i=2 -> slot 1-(0)=1 -> idx 1; i=3 -> slot 1-1=0 -> idx 0
        np.testing.assert_array_equal(idx, [0, 1, 1, 0])

    def test_valid_always_outranks_invalid(self):
        # invalid token has huge score but must not be selected while valid remain
        scores = jnp.asarray([[1e-6, 100.0, 2e-6, 3e-6]])
        valid = jnp.asarray([[True, False, True, True]])
        idx = np.asarray(masked_topk_with_recycle(scores, 3, valid)[0])
        assert 1 not in idx

    def test_all_padding_row_safe(self):
        scores = jnp.zeros((1, 4))
        valid = jnp.zeros((1, 4), bool)
        idx = masked_topk_with_recycle(scores, 2, valid)
        assert idx.shape == (1, 2)  # no NaN/crash; contents arbitrary but in-range
        assert np.all(np.asarray(idx) >= 0) and np.all(np.asarray(idx) < 4)


class TestFocal:
    def test_matches_reference_formula(self):
        rng = np.random.default_rng(3)
        logits = rng.normal(size=(6, 2)).astype(np.float32)
        targets = np.eye(2, dtype=np.float32)[rng.integers(0, 2, 6)]
        got = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), 6.0))
        # reference formula (misc.py:99-128)
        prob = 1 / (1 + np.exp(-logits))
        ce = -(targets * np.log(prob) + (1 - targets) * np.log(1 - prob))
        p_t = prob * targets + (1 - prob) * (1 - targets)
        loss = ce * (1 - p_t) ** 2
        alpha_t = 0.25 * targets + 0.75 * (1 - targets)
        want = (alpha_t * loss).mean(1).sum() / 6.0
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_element_mask_zeroes_rows(self):
        logits = jnp.ones((4, 2))
        targets = jnp.zeros((4, 2))
        mask = jnp.asarray([True, True, False, False])
        full = float(sigmoid_focal_loss(logits, targets, 4.0))
        half = float(sigmoid_focal_loss(logits, targets, 4.0, element_mask=mask))
        np.testing.assert_allclose(half, full / 2, rtol=1e-6)


class TestNMS:
    def test_triangular_suppresses_overlaps(self):
        boxes = jnp.asarray(
            [
                [0.0, 0.0, 0.4, 0.4],   # A
                [0.01, 0.01, 0.41, 0.41],  # overlaps A heavily
                [0.6, 0.6, 0.9, 0.9],   # B far away
            ]
        )
        scores = jnp.asarray([0.9, 0.8, 0.7])
        order, keep = nms_triangular(boxes, scores, iou_thresh=0.5, score_thresh=0.5)
        kept = set(np.asarray(order)[np.asarray(keep)].tolist())
        assert kept == {0, 2}

    def test_greedy_chain(self):
        # A suppresses B; B would suppress C but is dead -> greedy keeps C,
        # triangular (reference rule) kills C too.
        boxes = jnp.asarray(
            [
                [0.0, 0.0, 1.0, 1.0],
                [0.4, 0.0, 1.4, 1.0],   # IoU(A,B) = .6/1.4 ≈ .43
                [0.8, 0.0, 1.8, 1.0],   # IoU(B,C) ≈ .43, IoU(A,C) ≈ .1
            ]
        ) / 2.0
        scores = jnp.asarray([0.9, 0.8, 0.7])
        _, keep_g = nms_greedy(boxes, scores, iou_thresh=0.4)
        order_t, keep_t = nms_triangular(boxes, scores, iou_thresh=0.4, score_thresh=0.0)
        assert int(keep_g.sum()) == 2  # A and C survive greedy
        kept_t = set(np.asarray(order_t)[np.asarray(keep_t)].tolist())
        assert kept_t == {0}  # reference rule: B suppresses C even though B died

    def test_score_threshold(self):
        boxes = jnp.asarray([[0.0, 0.0, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]])
        scores = jnp.asarray([0.9, 0.3])
        order, keep = nms_triangular(boxes, scores, score_thresh=0.5)
        kept = np.asarray(order)[np.asarray(keep)]
        np.testing.assert_array_equal(kept, [0])
