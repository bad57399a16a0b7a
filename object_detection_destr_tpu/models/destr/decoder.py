"""DESTR split decoder: pair self-attention + split cls/reg cross-attention
with per-layer box refinement.

Re-design of the reference decoder (decoder_block.py:12-274). Per layer
(outer loop, decoder_block.py:43-66):

* re-derive the query sine embedding from *current* centers, modulated by a
  shared ``pos_scale`` MLP of the regression half (decoder_block.py:44-49);
* recompute boxes ``sigmoid(bbox_embed(reg_half) + inverse_sigmoid(centers))``
  feeding the IoU pairing of pair attention (decoder_block.py:51-54);
* one shared outer LayerNorm(2C) with residual (decoder_block.py:26, 65).

Per block (decoder_block.py:157-220):

* (a) blended self attention: bias-free Q/K projections for the object
  (2C-d) and positional (C-d, duplicated to 2C) streams; plain and pair
  self-attention outputs blended ``λ·norm1(x+dropout(o1)) +
  (1-λ)·norm2(x+dropout(o2))`` with λ = 0.5 (decoder_block.py:167-184);
* (b) split cross attention (conditional-DETR style): the blended output is
  split into cls/reg halves; per-branch queries are per-head
  concat[content-head ‖ pos-head] (decoder_block.py:189-210); keys likewise
  from encoder tokens + fine positional embedding; values are projected
  encoder tokens; each branch runs a single-head concat-QK cross attention +
  FFN(C -> 4C -> C) with two LayerNorms (``ClsRegBranch``,
  decoder_block.py:223-260); outputs re-concatenated to 2C
  (decoder_block.py:218).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...geometry.embeddings import inverse_sigmoid, sine_embed_centers
from ...ops.attention import combine_heads, scaled_dot_product_attention, split_heads
from ...ops.pallas.flash_attention import flash_attention_packed
from .layers import Mlp, attention_dropout_seed
from .pair_attention import pair_self_attention

__all__ = ["Decoder", "DecoderBlock", "ClsRegBranch"]


class ClsRegBranch(nn.Module):
    """Single-head concat-QK cross attention + FFN (decoder_block.py:223-260)."""

    hidden_dim: int = 256
    dropout: float = 0.3
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        inputs: jnp.ndarray,  # (B, S, C)
        query: jnp.ndarray,  # (B, S, 2C) concat[content ‖ pos] per head, merged
        key: jnp.ndarray,  # (B, L, 2C)
        value: jnp.ndarray,  # (B, L, C)
        key_valid_mask: jnp.ndarray,  # (B, L)
        deterministic: bool = True,
        attn_out: jnp.ndarray | None = None,  # precomputed attention (see
        # DecoderBlock's merged cls+reg flash call; attention is
        # parameter-free so the param tree is unchanged either way)
    ) -> jnp.ndarray:
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        # single head: scale is 1/sqrt(2C) (self_attention.py:26 on the
        # concat dim; the reference calls SelfAttention(heads_num=1) with
        # unsqueezed head axes, decoder_block.py:246-251)
        if attn_out is not None:
            ca = attn_out
        elif self.use_flash:
            # fused Pallas path: d_qk = 2C, d_v = C (kernel supports dv != d);
            # the long axis here is S_k = HW (up to 7056 dilated), exactly
            # where streaming K/V tiles beats the materialized logits matrix.
            # Head-packed entry with num_heads=1: no head axes to add/remove.
            rate, seed = attention_dropout_seed(self, self.dropout, deterministic)
            ca = flash_attention_packed(
                query, key, value, 1, key_valid_mask, seed, rate,
            )
        else:
            ca = scaled_dot_product_attention(
                query[:, None], key[:, None], value[:, None],
                key_valid_mask=key_valid_mask,
                dropout_rate=self.dropout,
                dropout_rng=self.make_rng("dropout") if not deterministic else None,
            )
        x = inputs + drop(ca)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = drop(nn.relu(nn.Dense(self.hidden_dim * 4, dtype=self.dtype, name="fc1")(x)))
        h = drop(nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc2")(h))
        x = x + h
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x)


class DecoderBlock(nn.Module):
    hidden_dim: int = 256
    num_heads: int = 8
    dropout: float = 0.3
    lambda_pair: float = 0.5
    pair_mode: str = "reference"
    pair_output_mode: str = "reference"
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        obj: jnp.ndarray,  # (B, S, 2C)
        enc_output: jnp.ndarray,  # (B, L, C)
        enc_pos: jnp.ndarray,  # (B, L, C) fine positional embedding
        enc_valid_mask: jnp.ndarray,  # (B, L)
        obj_coords: jnp.ndarray,  # (B, S, 4) current boxes (pairing signal)
        obj_pos_embed: jnp.ndarray,  # (B, S, C) static query pos embedding
        obj_sin_embed: jnp.ndarray,  # (B, S, C) per-layer scaled sine embedding
        deterministic: bool = True,
    ) -> jnp.ndarray:
        c, h2 = self.hidden_dim, self.num_heads
        dense_nb = lambda f, name: nn.Dense(f, use_bias=False, dtype=self.dtype, name=name)

        # --- (a) blended self attention over queries -----------------------
        q_obj = dense_nb(2 * c, "sa_q_obj")(obj)
        q_pos = dense_nb(c, "sa_q_pos")(obj_pos_embed)
        q_pos = jnp.concatenate([q_pos, q_pos], axis=-1)
        k_obj = dense_nb(2 * c, "sa_k_obj")(obj)
        k_pos = dense_nb(c, "sa_k_pos")(obj_pos_embed)
        k_pos = jnp.concatenate([k_pos, k_pos], axis=-1)
        v_m = dense_nb(2 * c, "sa_v_obj")(obj)
        q_m = q_obj + q_pos
        k_m = k_obj + k_pos
        # pre-split views feed the pair branch (its gathers are head-resolved)
        q, k, v = split_heads(q_m, h2), split_heads(k_m, h2), split_heads(v_m, h2)

        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        if self.use_flash:
            # head-packed fused path for the plain self-attention branch (the
            # pair branch's exotic structure stays XLA): operands stay
            # (B, S, 2C), no split/merge transposes
            rate, seed = attention_dropout_seed(self, self.dropout, deterministic)
            o1 = flash_attention_packed(q_m, k_m, v_m, h2, None, seed, rate)
        else:
            o1 = scaled_dot_product_attention(
                q, k, v,
                dropout_rate=self.dropout,
                dropout_rng=self.make_rng("dropout") if not deterministic else None,
            )
        o2 = pair_self_attention(
            q, k, v, obj_coords,
            pair_mode=self.pair_mode,
            pair_output_mode=self.pair_output_mode,
        )
        o = self.lambda_pair * nn.LayerNorm(dtype=self.dtype, name="norm1")(obj + drop(o1)) + (
            1.0 - self.lambda_pair
        ) * nn.LayerNorm(dtype=self.dtype, name="norm2")(obj + drop(o2))

        # --- (b) split cls/reg cross attention -----------------------------
        o_cls, o_reg = o[..., :c], o[..., c:]

        q_obj = dense_nb(2 * c, "ca_q_obj")(o)
        q_pos = dense_nb(c, "ca_q_pos")(obj_sin_embed)
        k_enc = dense_nb(c, "ca_k_enc")(enc_output)
        k_pos = dense_nb(c, "ca_k_pos")(enc_pos)
        v2 = dense_nb(c, "ca_v_enc")(enc_output)

        # per-head concat[content(32) ‖ pos(32)] (decoder_block.py:195-210)
        q_cls = split_heads(q_obj[..., :c], h2)
        q_reg = split_heads(q_obj[..., c:], h2)
        q_pos_h = split_heads(q_pos, h2)
        q_cls = combine_heads(jnp.concatenate([q_cls, q_pos_h], axis=-1))
        q_reg = combine_heads(jnp.concatenate([q_reg, q_pos_h], axis=-1))
        k = combine_heads(
            jnp.concatenate([split_heads(k_enc, h2), split_heads(k_pos, h2)], axis=-1)
        )

        ca_cls = ca_reg = None
        if self.use_flash:
            # one merged flash call for both branches: rows of cross
            # attention are independent, and cls/reg share K and V, so
            # stacking the two query sets along the sequence axis halves the
            # kernel launches (fwd AND bwd), streams K/V once instead of
            # twice, and lets the fused backward accumulate the joint dK/dV
            # in-kernel instead of XLA adding two per-branch gradients.
            rate, seed = attention_dropout_seed(self, self.dropout, deterministic)
            s = q_cls.shape[1]
            ca = flash_attention_packed(
                jnp.concatenate([q_cls, q_reg], axis=1), k, v2, 1,
                enc_valid_mask, seed, rate,
            )
            ca_cls, ca_reg = ca[:, :s], ca[:, s:]

        cls_out = ClsRegBranch(
            c, self.dropout, self.use_flash, dtype=self.dtype, name="cls_branch"
        )(o_cls, q_cls, k, v2, enc_valid_mask, deterministic, attn_out=ca_cls)
        reg_out = ClsRegBranch(
            c, self.dropout, self.use_flash, dtype=self.dtype, name="reg_branch"
        )(o_reg, q_reg, k, v2, enc_valid_mask, deterministic, attn_out=ca_reg)
        return jnp.concatenate([cls_out, reg_out], axis=-1)


class Decoder(nn.Module):
    """Stack of decoder blocks with per-layer box refinement.

    ``bbox_embed`` is the *shared* top-level box head (decoder gets it at call
    time from the model, mirroring model.py:117 / decoder_block.py:51).
    """

    hidden_dim: int = 256
    num_heads: int = 8
    num_blocks: int = 6
    dropout: float = 0.3
    lambda_pair: float = 0.5
    pair_mode: str = "reference"
    pair_output_mode: str = "reference"
    use_flash: bool = False
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.pos_scale = Mlp([self.hidden_dim, self.hidden_dim], dtype=self.dtype, name="pos_scale")
        block_cls = (
            nn.remat(DecoderBlock, static_argnums=(8,)) if self.remat else DecoderBlock
        )
        self.blocks = [
            block_cls(
                self.hidden_dim,
                self.num_heads,
                self.dropout,
                self.lambda_pair,
                self.pair_mode,
                self.pair_output_mode,
                self.use_flash,
                self.dtype,
                name=f"block{i}",
            )
            for i in range(self.num_blocks)
        ]
        self.outer_norm = nn.LayerNorm(dtype=self.dtype, name="outer_norm")

    def __call__(
        self,
        selected_objects: jnp.ndarray,  # (B, S, 2C)
        encoder_output: jnp.ndarray,  # (B, L, C)
        enc_valid_mask: jnp.ndarray,  # (B, L)
        fine_pos: jnp.ndarray,  # (B, L, C)
        obj_pos_embed: jnp.ndarray,  # (B, S, C)
        selected_centers: jnp.ndarray,  # (B, S, 2)
        bbox_embed,  # shared MLP C -> C -> 4
        deterministic: bool = True,
    ) -> jnp.ndarray:
        x = selected_objects
        c = self.hidden_dim
        centers_logit = inverse_sigmoid(selected_centers)

        for blk in self.blocks:
            reg_half = x[..., c:]
            obj_pos_trans = self.pos_scale(reg_half)
            sin_embed = sine_embed_centers(selected_centers, d_model=c) * obj_pos_trans

            tmp_bbox = bbox_embed(reg_half)
            tmp_bbox = tmp_bbox.at[..., :2].add(centers_logit)
            obj_coords = jax.nn.sigmoid(tmp_bbox)

            tmp = blk(
                x,
                encoder_output,
                fine_pos,
                enc_valid_mask,
                obj_coords,
                obj_pos_embed,
                sin_embed,
                deterministic,
            )
            x = self.outer_norm(x + tmp)
        return x
