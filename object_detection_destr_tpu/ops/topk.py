"""On-device masked top-k with index recycling.

Replaces the host-side per-image Python loop of the reference mini-detector
(mini_detector.py:70-104) with a fully vectorized, jit-safe equivalent.

Reference semantics being reproduced:

* scores are per-token max sigmoid class scores with padded tokens zeroed
  (mini_detector.py:78-81, 149-151) — since sigmoid(x) > 0, every valid token
  outranks every padded token, so ``top_k`` returns the valid tokens first,
  sorted by score.
* when an image has fewer than k valid tokens, indices are recycled: entry i
  (i >= valid) takes ``topk_idx[valid - 1 - (i % valid)]`` — the reference
  builds this by flipping the first ``valid`` indices and tiling
  (mini_detector.py:87-97).

Static-shape deviation (documented in REFCOMPAT.md): the reference shrinks k
dynamically to the valid count of *image 0* (mini_detector.py:153-154, itself
flagged as a defect in SURVEY.md §2.1 #6). Here k is static; images with
fewer valid tokens recycle indices, which is the reference's own intent for
the per-image case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["masked_topk_with_recycle"]


def masked_topk_with_recycle(
    scores: jnp.ndarray,
    k: int,
    valid_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Top-k indices per row, recycling valid indices when valid < k.

    Args:
        scores: (B, S) non-negative scores; padded positions MUST already be
            zeroed (or pass valid_mask and we zero them here).
        k: static number of indices to return (k <= S).
        valid_mask: (B, S) bool, True = valid token.

    Returns:
        (B, k) int32 indices into S.
    """
    b, s = scores.shape
    if k > s:
        raise ValueError(f"k={k} must be <= sequence length {s}")
    scores = jnp.where(valid_mask, scores, 0.0)
    # strictly rank valid above invalid even if a valid score is exactly 0
    scores = scores + valid_mask.astype(scores.dtype) * 1e-12
    _, topk_idx = jax.lax.top_k(scores, k)  # (B, k), score-sorted

    valid_counts = jnp.sum(valid_mask.astype(jnp.int32), axis=-1)  # (B,)
    valid_counts = jnp.maximum(valid_counts, 1)  # guard all-pad rows

    pos = jnp.arange(k, dtype=jnp.int32)[None, :]  # (1, k)
    v = jnp.minimum(valid_counts, k)[:, None]  # (B, 1)
    # i < v: take slot i; i >= v: take slot v - 1 - (i mod v)  (flip-tile recycle)
    recycled = v - 1 - (pos % v)
    slot = jnp.where(pos < v, pos, recycled)
    return jnp.take_along_axis(topk_idx, slot, axis=-1).astype(jnp.int32)
