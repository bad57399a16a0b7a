"""Shared flax building blocks for the DESTR transformer."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.attention import scaled_dot_product_attention, split_heads
from ...ops.pallas.flash_attention import flash_attention_packed

__all__ = [
    "Mlp",
    "MultiHeadAttention",
    "LearnedPositionEmbedding",
    "attention_dropout_seed",
]


def attention_dropout_seed(module: nn.Module, dropout: float, deterministic: bool):
    """(rate, seed) for the flash kernel's in-kernel dropout.

    Draws an int32 seed from the module's "dropout" rng stream when training
    with dropout; otherwise (eval, or rate 0) returns rate 0 and no seed so
    the kernel skips its PRNG path entirely.
    """
    if deterministic or dropout <= 0.0:
        return 0.0, None
    rng = module.make_rng("dropout")
    seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    return dropout, seed


class LearnedPositionEmbedding(nn.Module):
    """Learned 2-D position embedding (position_encoding_cdetr.py:93-127).

    Two 50-entry embedding tables for row/col indices; output per pixel is
    ``concat[col_embed(x), row_embed(y)]`` (x first — the learned variant's
    order is opposite to the sine map's y-first, kept faithful). The
    reference exposes this behind its builder but wires the sine variant
    (position_encoding_cdetr.py:144-150); available here via
    ``DestrConfig.pos_embed = "learned"``.
    """

    num_pos_feats: int = 128
    table_size: int = 50

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        row = nn.Embed(self.table_size, self.num_pos_feats, name="row_embed")
        col = nn.Embed(self.table_size, self.num_pos_feats, name="col_embed")
        x_emb = col(jnp.arange(w))  # (W, d)
        y_emb = row(jnp.arange(h))  # (H, d)
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(x_emb[None, :, :], (h, w, self.num_pos_feats)),
                jnp.broadcast_to(y_emb[:, None, :], (h, w, self.num_pos_feats)),
            ],
            axis=-1,
        )
        return pos  # (H, W, 2d)


class Mlp(nn.Module):
    """Linear stack with ReLU between layers (no final activation).

    Used for the shared heads: bbox_embed 256->256->4 (model.py:33-39),
    reg_ffn 256->256->256->2 (model.py:40-50), pos_scale MLPs
    (encoder_block.py:17-21, decoder_block.py:21-25, model.py:51-57).
    """

    features: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"fc{i}")(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        return x


class MultiHeadAttention(nn.Module):
    """Torch-``nn.MultiheadAttention``-equivalent MHA, batch-first.

    Separate q/k/v input projections + output projection, all with bias
    (matching the capacity of the reference's encoder attention,
    encoder_block.py:57-63). Dropout is applied to attention probabilities
    and disabled when ``deterministic`` — fixing the reference's
    always-on eval dropout (self_attention.py:40).
    """

    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # fused Pallas attention path (ops/pallas/flash_attention.py), including
    # in-kernel attention-probability dropout (seeded from the flax
    # "dropout" rng stream, regenerated bit-identically in the backward)
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key: jnp.ndarray,
        value: jnp.ndarray,
        key_valid_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        d = query.shape[-1]
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(value)
        if self.use_flash:
            # head-packed kernel: q/k/v stay (B, S, h*d) — no split_heads
            # transposes in or out (the r2 profile charged ~6.8 ms/step of
            # pad/transpose glue to the unpacked call sites, BASELINE.md)
            rate, seed = attention_dropout_seed(self, self.dropout, deterministic)
            out = flash_attention_packed(
                q, k, v, self.num_heads, key_valid_mask, seed, rate,
            )
        else:
            rng = None
            if not deterministic and self.dropout > 0:
                rng = self.make_rng("dropout")
            out = scaled_dot_product_attention(
                split_heads(q, self.num_heads),
                split_heads(k, self.num_heads),
                split_heads(v, self.num_heads),
                key_valid_mask=key_valid_mask,
                dropout_rate=self.dropout,
                dropout_rng=rng,
            )
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)
