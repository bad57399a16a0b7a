"""Sine positional embeddings + logit helpers (pure jnp).

Two distinct sine encodings exist in the reference and both are kept:

* :func:`sine_position_map` — the Conditional-DETR image-plane encoding over a
  (masked) H×W feature map (position_encoding_cdetr.py:20-90).
* :func:`sine_embed_centers` — the box-center encoding used for decoder query
  positions (positional_embedding.py:6-39).

Layout note: this framework is NHWC, so the map encoding returns
``(B, H, W, C)`` (the reference returns channels-first).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["sine_position_map", "sine_embed_centers", "inverse_sigmoid"]


def _interleave_sin_cos(pos: jnp.ndarray) -> jnp.ndarray:
    """stack(sin(pos[..., 0::2]), cos(pos[..., 1::2])) interleaved on the last axis.

    Matches the torch idiom ``torch.stack((x[..., 0::2].sin(),
    x[..., 1::2].cos()), dim=-1).flatten(-2)`` used by both reference
    encodings (position_encoding_cdetr.py:56-61, positional_embedding.py:31-36).
    """
    sin = jnp.sin(pos[..., 0::2])
    cos = jnp.cos(pos[..., 1::2])
    return jnp.stack([sin, cos], axis=-1).reshape(*pos.shape[:-1], -1)


def sine_position_map(
    valid_mask: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Mask-aware 2-D sine position encoding over an image feature map.

    Args:
        valid_mask: (B, H, W) bool, True = real pixel (note: the reference's
            mask is inverted — True = padding; position_encoding_cdetr.py:43).
        num_pos_feats: features per axis; output channels = 2 * num_pos_feats.

    Returns:
        (B, H, W, 2 * num_pos_feats) with the y-embedding first then x
        (position_encoding_cdetr.py:62).
    """
    if scale is None:
        scale = 2 * math.pi
    not_mask = valid_mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = _interleave_sin_cos(x_embed[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y_embed[..., None] / dim_t)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


def sine_embed_centers(centers: jnp.ndarray, d_model: int = 512) -> jnp.ndarray:
    """Sine/cos embedding of (cx, cy) query centers into ``d_model`` dims.

    Mirrors reference ``gen_sineembed_for_position``
    (positional_embedding.py:6-39): x reads ``centers[..., 0]``, y reads
    ``centers[..., 1]``, each scaled by 2π, embedded into d_model/2 dims with
    temperature 10000, concatenated as [y_half ‖ x_half].

    Args:
        centers: (..., >=2) — only the first two components are used.

    Returns:
        (..., d_model)
    """
    scale = 2 * math.pi
    half = d_model // 2
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / half)

    x_embed = centers[..., 0] * scale
    y_embed = centers[..., 1] * scale
    pos_x = _interleave_sin_cos(x_embed[..., None] / dim_t)
    pos_y = _interleave_sin_cos(y_embed[..., None] / dim_t)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def inverse_sigmoid(x: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    """logit(x) with an eps clamp.

    Reference (misc.py:59-62) computes ``-log(1/clip(x, eps) - 1)`` which is
    +inf at x == 1; we additionally clamp the log argument at eps so the
    result is finite (bounded by ±log(eps)) — a numerical-safety fix, the
    values are identical for x in [eps, 1 - eps].
    """
    x = jnp.maximum(x, epsilon)
    return -jnp.log(jnp.maximum(1.0 / x - 1.0, epsilon))
