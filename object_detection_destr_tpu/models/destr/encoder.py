"""DESTR transformer encoder over H*W image tokens (batch-first, NHWC in/out).

Re-design of the reference encoder (encoder_block.py:8-124):

* 6 blocks; a *shared* content-adaptive positional-scale MLP
  (``pos_scale``: 256->256->256) modulates the positional embedding per block
  (encoder_block.py:17-21, 33-39).
* a *single shared* outer LayerNorm wraps every block with an extra residual:
  ``x = norm(x + block(x))`` (encoder_block.py:22, 40).
* per block: MHA(8 heads, dropout 0.3) with Q=K=x+pos, V=x
  (encoder_block.py:95-103), FFN 256->2048->256 with dropouts and two
  LayerNorms (encoder_block.py:104-111).

Layout: the reference shuttles (B,C,H,W) <-> (HW,B,C)
(encoder_block.py:27-31); here tokens stay batch-first (B, HW, C) end to end
— one reshape at each boundary, no transposes inside the loop.

The reference's dead ``_proj_to_q/k/v`` Linears (encoder_block.py:76-82,
never called) are intentionally not reproduced.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import Mlp, MultiHeadAttention

__all__ = ["Encoder", "EncoderBlock"]


class EncoderBlock(nn.Module):
    hidden_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pos_embed: jnp.ndarray,
        valid_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        qk = x + pos_embed
        attn = MultiHeadAttention(
            self.num_heads, self.dropout, dtype=self.dtype,
            use_flash=self.use_flash, name="self_attn",
        )(
            qk, qk, x, key_valid_mask=valid_mask, deterministic=deterministic
        )
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(nn.relu(h))
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = x + h
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x)


class Encoder(nn.Module):
    hidden_dim: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    num_blocks: int = 6
    dropout: float = 0.3
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    use_flash: bool = False

    def setup(self):
        self.pos_scale = Mlp([self.hidden_dim, self.hidden_dim], dtype=self.dtype, name="pos_scale")
        block_cls = (
            nn.remat(EncoderBlock, static_argnums=(4,)) if self.remat else EncoderBlock
        )
        self.blocks = [
            block_cls(
                self.hidden_dim, self.num_heads, self.ffn_dim, self.dropout,
                dtype=self.dtype, use_flash=self.use_flash, name=f"block{i}"
            )
            for i in range(self.num_blocks)
        ]
        self.outer_norm = nn.LayerNorm(dtype=self.dtype, name="outer_norm")

    def __call__(
        self,
        tokens: jnp.ndarray,
        pos_embed: jnp.ndarray,
        valid_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """tokens/pos_embed: (B, HW, C); valid_mask: (B, HW) True=real."""
        x = tokens
        for blk in self.blocks:
            scale = self.pos_scale(x)
            tmp = blk(x, pos_embed * scale, valid_mask, deterministic)
            x = self.outer_norm(x + tmp)
        return x
