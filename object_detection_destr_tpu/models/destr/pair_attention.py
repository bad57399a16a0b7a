"""Pair self-attention — DESTR's signature decoder op, fully vectorized.

Re-design of the reference PairSelfAttention (pair_self_attention.py:9-171):
the per-image Python ``index_select`` loops (pair_self_attention.py:47-89)
become batched ``take_along_axis`` gathers, and the pairing itself
(IoU-argmax partner + L1-size ordering, pair_self_attention.py:110-171) is
pure broadcasted jnp.

Semantics:
    1. each query is paired with the query whose box has the highest IoU with
       it (self excluded via an identity subtraction);
    2. the pair is ordered (left, right) with the larger-|w|+|h| box left;
    3. A2[a, b] = <q_l[a], k_l[b]> + <q_r[a], k_r[b]>;
    4. O2 = softmax(A2) @ [v_l ‖ v_r], with only the half corresponding to
       the query's own slot kept.

Two documented numerics switches (REFCOMPAT.md):
    * ``pair_mode``: the reference applies softmax *before* dividing by
      sqrt(2d) (pair_self_attention.py:98) — which scales the output by
      1/sqrt(2d) instead of sharpening the distribution. "paper" scales the
      logits before softmax.
    * ``pair_output_mode``: the reference's (B,S,h,2d)->(B,S,2,h*d) reshape
      splits by *head group* (heads 0..h/2-1 vs h/2..h-1) rather than by
      pair slot (pair_self_attention.py:99-105). "paper" keeps the left/right
      value halves instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...geometry.boxes import box_l1_size, cxcyhw_to_xyxy

__all__ = ["get_pairs", "pair_self_attention"]


def get_pairs(centers_cxcyhw: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """IoU-argmax pairing with L1-size ordering.

    Args:
        centers_cxcyhw: (B, S, 4) predicted boxes.

    Returns:
        (B, S, 2) int32 — ordered (left, right) query indices per query.
    """
    b, s, _ = centers_cxcyhw.shape
    boxes = cxcyhw_to_xyxy(centers_cxcyhw)

    # reference computes IoU *without* clamping the intersection at zero
    # (pair_self_attention.py:122-126) — negative "IoU" for disjoint boxes
    # still picks the nearest box under argmax, so we reproduce it.
    b1 = boxes[:, :, None, :]
    b2 = boxes[:, None, :, :]
    inter_wh = jnp.minimum(b1[..., 2:], b2[..., 2:]) - jnp.maximum(b1[..., :2], b2[..., :2])
    inter_area = inter_wh[..., 0] * inter_wh[..., 1]
    area = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    union = area[:, :, None] + area[:, None, :] - inter_area
    iou = inter_area / (union + epsilon) - jnp.eye(s, dtype=boxes.dtype)

    partner = jnp.argmax(iou, axis=-1).astype(jnp.int32)  # (B, S)
    own = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (b, s))

    l1 = box_l1_size(boxes)  # (B, S)
    partner_l1 = jnp.take_along_axis(l1, partner, axis=-1)
    own_first = l1 >= partner_l1  # larger box goes left (pair_self_attention.py:163-169)
    left = jnp.where(own_first, own, partner)
    right = jnp.where(own_first, partner, own)
    return jnp.stack([left, right], axis=-1)


def _gather_queries(t: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather (B, h, S, d) along S with (B, S) indices — as a one-hot matmul.

    TPU rationale: ``take_along_axis`` lowers to gather fusions (~0.12 ms
    each at b8/S300 bf16, ~20 GB/s effective) and its backward to scatter
    fusions — the r3 profile charged ~4.9 ms/step to these. A one-hot
    permutation matmul does the identical selection on the MXU (~15 us), and
    its transpose (the backward) is another matmul — no scatters anywhere.
    Exactness: each one-hot row has a single 1.0, so the "sum" is the
    selected value itself — bit-identical to the gather for finite inputs.
    """
    onehot = jax.nn.one_hot(idx, t.shape[2], dtype=t.dtype)  # (B, S, S)
    return jnp.einsum("bqs,bhsd->bhqd", onehot, t)


def pair_self_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    centers_cxcyhw: jnp.ndarray,
    *,
    pair_mode: str = "reference",
    pair_output_mode: str = "reference",
) -> jnp.ndarray:
    """Args:
        query/key/value: (B, h, S, d) pre-split heads.
        centers_cxcyhw: (B, S, 4) current box predictions (pairing signal).

    Returns:
        (B, S, h * d) — batch-first, heads merged (matching the plain
        self-attention output so the two can be blended).
    """
    b, h, s, d = query.shape
    pairs = get_pairs(centers_cxcyhw)  # (B, S, 2)
    left, right = pairs[..., 0], pairs[..., 1]

    ql, kl, vl = (_gather_queries(t, left) for t in (query, key, value))
    qr, kr, vr = (_gather_queries(t, right) for t in (query, key, value))

    a2 = jnp.einsum("bhqd,bhkd->bhqk", ql, kl) + jnp.einsum("bhqd,bhkd->bhqk", qr, kr)
    inv_scale = 1.0 / jnp.sqrt(jnp.asarray(2 * d, a2.dtype))
    if pair_mode == "paper":
        attn = jax.nn.softmax(a2 * inv_scale, axis=-1)
    else:  # reference: softmax first, then scale the probabilities
        attn = jax.nn.softmax(a2, axis=-1) * inv_scale

    own = jnp.arange(s, dtype=jnp.int32)
    # slot kept iff its index equals the query's own index
    # (the reference's flipped_mask, pair_self_attention.py:42-45)
    own_is_left = left == own  # (B, S)
    own_is_right = right == own

    if pair_output_mode == "paper":
        o_l = jnp.einsum("bhqk,bhkd->bhqd", attn, vl)
        o_r = jnp.einsum("bhqk,bhkd->bhqd", attn, vr)
        o_l = o_l.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        o_r = o_r.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        return jnp.where(own_is_left[..., None], o_l, 0.0) + jnp.where(
            own_is_right[..., None], o_r, 0.0
        )

    # reference flatten-order: (B,h,S,2d) -> (B,S,h*2d) -> (B,S,2,h*d):
    # slot 0 = heads [0, h/2), slot 1 = heads [h/2, h) (each with l‖r halves)
    v_pair = jnp.concatenate([vl, vr], axis=-1)  # (B, h, S, 2d)
    o2 = jnp.einsum("bhqk,bhkd->bhqd", attn, v_pair)  # (B, h, S, 2d)
    o2 = o2.transpose(0, 2, 1, 3).reshape(b, s, 2, h * d)
    keep = jnp.stack([own_is_left, own_is_right], axis=-1)  # (B, S, 2)
    return jnp.sum(jnp.where(keep[..., None], o2, 0.0), axis=2)
