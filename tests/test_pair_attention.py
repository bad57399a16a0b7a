"""Pair self-attention tests vs a literal numpy transcription of the
reference op (pair_self_attention.py:9-171)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from object_detection_destr_tpu.models.destr.pair_attention import (  # noqa: E402
    get_pairs,
    pair_self_attention,
)

from helpers import _np_cxcyhw_to_xyxy  # noqa: E402


def _np_pairs(boxes_cxcyhw):
    """Reference pairing: unclamped-intersection IoU argmax (self excluded),
    larger |w|+|h| box first (pair_self_attention.py:110-171)."""
    b, s, _ = boxes_cxcyhw.shape
    out = np.zeros((b, s, 2), np.int32)
    for bi in range(b):
        xy = _np_cxcyhw_to_xyxy(boxes_cxcyhw[bi])
        area = (xy[:, 2] - xy[:, 0]) * (xy[:, 3] - xy[:, 1])
        inter_w = np.minimum(xy[:, None, 2], xy[None, :, 2]) - np.maximum(
            xy[:, None, 0], xy[None, :, 0]
        )
        inter_h = np.minimum(xy[:, None, 3], xy[None, :, 3]) - np.maximum(
            xy[:, None, 1], xy[None, :, 1]
        )
        inter = inter_w * inter_h  # NOT clamped (reference quirk)
        union = area[:, None] + area[None, :] - inter
        iou = inter / (union + 1e-6) - np.eye(s)
        partner = iou.argmax(-1)
        l1 = np.abs(xy[:, 2] - xy[:, 0]) + np.abs(xy[:, 3] - xy[:, 1])
        for i in range(s):
            j = partner[i]
            if l1[i] >= l1[j]:
                out[bi, i] = (i, j)
            else:
                out[bi, i] = (j, i)
    return out


def _boxes(rng, b=2, s=6):
    return np.stack(
        [
            rng.uniform(0.2, 0.8, size=(b, s)),
            rng.uniform(0.2, 0.8, size=(b, s)),
            rng.uniform(0.1, 0.5, size=(b, s)),
            rng.uniform(0.1, 0.5, size=(b, s)),
        ],
        -1,
    ).astype(np.float32)


def test_get_pairs_matches_reference_rule():
    rng = np.random.default_rng(0)
    boxes = _boxes(rng)
    ours = np.asarray(get_pairs(jnp.asarray(boxes)))
    golden = _np_pairs(boxes)
    np.testing.assert_array_equal(ours, golden)


@pytest.mark.parametrize("pair_mode", ["reference", "paper"])
def test_pair_attention_matches_numpy(pair_mode):
    rng = np.random.default_rng(1)
    b, h, s, d = 2, 4, 6, 8
    q = rng.normal(size=(b, h, s, d)).astype(np.float32)
    k = rng.normal(size=(b, h, s, d)).astype(np.float32)
    v = rng.normal(size=(b, h, s, d)).astype(np.float32)
    boxes = _boxes(rng, b, s)

    ours = np.asarray(
        pair_self_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(boxes),
            pair_mode=pair_mode, pair_output_mode="reference",
        )
    )

    pairs = _np_pairs(boxes)
    golden = np.zeros((b, s, h * d), np.float32)
    for bi in range(b):
        left, right = pairs[bi, :, 0], pairs[bi, :, 1]
        ql, kl, vl = q[bi][:, left], k[bi][:, left], v[bi][:, left]
        qr, kr, vr = q[bi][:, right], k[bi][:, right], v[bi][:, right]
        a2 = np.einsum("hqd,hkd->hqk", ql, kl) + np.einsum("hqd,hkd->hqk", qr, kr)
        inv = 1.0 / np.sqrt(2 * d)
        if pair_mode == "paper":
            e = np.exp(a2 * inv - (a2 * inv).max(-1, keepdims=True))
            attn = e / e.sum(-1, keepdims=True)
        else:
            e = np.exp(a2 - a2.max(-1, keepdims=True))
            attn = e / e.sum(-1, keepdims=True) * inv
        v_pair = np.concatenate([vl, vr], axis=-1)  # (h, s, 2d)
        o2 = np.einsum("hqk,hkd->hqd", attn, v_pair)  # (h, s, 2d)
        # reference flatten order: (s, h, 2d) -> (s, 2, h*d)
        o2 = o2.transpose(1, 0, 2).reshape(s, 2, h * d)
        own = np.arange(s)
        keep = np.stack([left == own, right == own], -1)  # (s, 2)
        golden[bi] = (o2 * keep[..., None]).sum(1)
    np.testing.assert_allclose(ours, golden, rtol=1e-5, atol=1e-5)


def test_pair_attention_output_modes_differ():
    rng = np.random.default_rng(2)
    b, h, s, d = 1, 4, 5, 8
    q = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    boxes = jnp.asarray(_boxes(rng, b, s))
    a = pair_self_attention(q, k, v, boxes, pair_output_mode="reference")
    c = pair_self_attention(q, k, v, boxes, pair_output_mode="paper")
    assert a.shape == c.shape == (b, s, h * d)
    assert not np.allclose(np.asarray(a), np.asarray(c))
