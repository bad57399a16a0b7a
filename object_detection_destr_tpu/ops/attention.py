"""Attention primitives (functional, batch-first, TPU-friendly).

The reference leans on ``nn.MultiheadAttention`` in sequence-first layout
(encoder_block.py:57-63) and a hand-rolled ``SelfAttention`` over pre-split
heads (self_attention.py:8-47). Here everything is batch-first ``(B, S, D)``
or pre-split ``(B, h, S, d)``, computed with einsums that XLA maps straight
onto the MXU. A Pallas flash-attention path with the same signature lives in
``ops/pallas/flash_attention.py`` and is selected by
:func:`scaled_dot_product_attention` for long sequences on TPU.

Reference defect fixed here: the reference constructs ``nn.Dropout`` inside
``forward`` so attention dropout stays active in eval
(self_attention.py:40). We take an explicit ``dropout_rng``; passing ``None``
(eval) disables dropout.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "scaled_dot_product_attention",
    "multi_head_attention",
    "split_heads",
    "combine_heads",
]

NEG_INF = -1e9  # finite -inf stand-in: keeps softmax well-defined on full-pad rows


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, S, D) -> (B, h, S, D/h)."""
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def combine_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, h, S, d) -> (B, S, h*d)."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def scaled_dot_product_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    *,
    key_valid_mask: Optional[jnp.ndarray] = None,
    attn_bias: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Attention over pre-split heads.

    Args:
        query/key: (B, h, S_q, d) / (B, h, S_k, d).
        value:     (B, h, S_k, d_v) — d_v may differ from d.
        key_valid_mask: (B, S_k) bool, True = attendable (the reference's
            ``key_padding_mask`` is inverted: True = masked;
            self_attention.py:34-37).
        attn_bias: optional additive (.., S_q, S_k) bias.
        dropout_rng: None disables dropout (eval); matches reference train
            behavior when provided (softmax -> dropout -> @V,
            self_attention.py:39-43).
        scale: default 1/sqrt(d) like the reference (self_attention.py:26).

    Returns:
        (B, S_q, h*d_v) — heads merged, batch-first.
    """
    d = query.shape[-1]
    if scale is None:
        scale = 1.0 / float(d) ** 0.5
    # bf16-friendly: QK^T on the MXU in the input dtype with f32 accumulation,
    # softmax in f32, PV back in the input dtype
    logits = (
        jnp.einsum(
            "bhqd,bhkd->bhqk", query, key, preferred_element_type=jnp.float32
        )
        * scale
    )
    if attn_bias is not None:
        logits = logits + attn_bias.astype(jnp.float32)
    if key_valid_mask is not None:
        logits = jnp.where(key_valid_mask[:, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhqk,bhkv->bhqv", probs.astype(value.dtype), value,
        preferred_element_type=jnp.float32,
    ).astype(value.dtype)
    return combine_heads(out)


def multi_head_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    num_heads: int,
    *,
    key_valid_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Projection-free MHA over (B, S, D) tensors (projections live in the
    calling module so weights can be shared/shaped per the reference)."""
    q = split_heads(query, num_heads)
    k = split_heads(key, num_heads)
    v = split_heads(value, num_heads)
    return scaled_dot_product_attention(
        q,
        k,
        v,
        key_valid_mask=key_valid_mask,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
    )
