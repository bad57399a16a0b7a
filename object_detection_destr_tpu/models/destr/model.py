"""DESTR top-level model: backbone -> encoder -> mini-detector -> split decoder.

Re-design of the reference ``ObjDetSplitTransformer`` (model.py:14-154),
TPU-first: NHWC, batch-first tokens, static shapes, padded-mask plumbing
replacing NestedTensor.

Shared heads (model.py:30-71): ``cls_embed`` Linear(C -> num_cls),
``bbox_embed`` MLP C -> C -> 4, ``pos_head`` (the reference's ``reg_ffn``)
MLP C -> C -> C -> 2 are single module instances used by both the
mini-detector and the final output heads — flax shares parameters when the
same module instance is invoked from multiple call sites.

Forward contract (model.py:73-133):
    inputs: images (B, H, W, 3), optional valid_mask (B, H, W).
    returns: ({"pred_class": (B, k, num_cls), "pred_boxes": (B, k, 4)},
              {"pred_class": (B, HW, num_cls), "pred_boxes": (B, HW, 4)})
    boxes are cxcyhw in [0, 1]; class entries are raw logits.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...config import DestrConfig
from ...geometry.embeddings import inverse_sigmoid, sine_embed_centers, sine_position_map
from ..resnet import downsample_mask, resnet101, resnet50
from .decoder import Decoder
from .encoder import Encoder
from .layers import LearnedPositionEmbedding, Mlp
from .mini_detector import MiniDetector

__all__ = ["DESTR", "build_destr"]


class DESTR(nn.Module):
    config: DestrConfig

    def setup(self):
        cfg = self.config
        c = cfg.hidden_dim
        use_flash = (
            jax.default_backend() == "tpu"
            if cfg.use_flash_attention == "auto"
            else bool(cfg.use_flash_attention)
        )
        # computation dtype: backbone/transformer/mini-det convs run in bf16
        # on the MXU; the shared heads stay f32 (box coordinates need more
        # than bf16's ~3 decimal digits), so head inputs upcast automatically
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        if cfg.backbone == "resnet50":
            self.backbone = resnet50(cfg.dilation, dtype=dtype)
        elif cfg.backbone == "resnet101":
            self.backbone = resnet101(cfg.dilation, dtype=dtype)
        else:
            raise ValueError(f"unknown backbone {cfg.backbone}")

        # shared heads (model.py:30-57) — f32 by design
        self.cls_embed = nn.Dense(cfg.num_cls, name="cls_embed")
        self.bbox_embed = Mlp([c, 4], name="bbox_embed")
        self.pos_head = Mlp([c, c, 2], name="pos_head")  # reference `_reg_ffn`

        self.reduce_dim = nn.Conv(c, (1, 1), dtype=dtype, name="reduce_dim")  # 2048 -> 256
        if cfg.pos_embed == "learned":
            self.pos_embedding = LearnedPositionEmbedding(
                num_pos_feats=c // 2, name="pos_embedding"
            )

        self.encoder = Encoder(
            hidden_dim=c,
            num_heads=cfg.num_heads,
            ffn_dim=cfg.ffn_dim,
            num_blocks=cfg.num_encoder_blocks,
            dropout=cfg.dropout,
            dtype=dtype,
            remat=cfg.remat,
            use_flash=use_flash,
            name="encoder",
        )
        self.decoder = Decoder(
            hidden_dim=c,
            num_heads=cfg.num_heads,
            num_blocks=cfg.num_decoder_blocks,
            dropout=cfg.dropout,
            lambda_pair=cfg.lambda_pair,
            pair_mode=cfg.pair_mode,
            pair_output_mode=cfg.pair_output_mode,
            use_flash=use_flash,
            dtype=dtype,
            remat=cfg.remat,
            name="decoder",
        )
        self.mini_detector = MiniDetector(
            top_k=cfg.top_k,
            cls_embed=self.cls_embed,
            bbox_embed=self.bbox_embed,
            pos_head=self.pos_head,
            hidden_dim=c,
            dtype=dtype,
            bn_axis_name=cfg.bn_axis_name,
            name="mini_detector",
        )

    def __call__(
        self,
        images: jnp.ndarray,
        valid_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        cfg = self.config
        b, h_img, w_img, _ = images.shape
        if valid_mask is None:
            valid_mask = jnp.ones((b, h_img, w_img), bool)

        compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        feats = self.backbone(images.astype(compute_dtype))
        c5 = feats["layer4"]  # (B, H/32, W/32, 2048)
        _, h, w, _ = c5.shape
        c5_valid = downsample_mask(valid_mask, (h, w))

        x_map = self.reduce_dim(c5)  # (B, h, w, C)

        if cfg.pos_embed == "learned":
            pos_map = jnp.broadcast_to(
                self.pos_embedding(h, w)[None], (b, h, w, cfg.hidden_dim)
            )
        else:
            # image-plane sine positions, N_steps = C/2
            # (position_encoding_cdetr.py:144-150)
            pos_map = sine_position_map(c5_valid, num_pos_feats=cfg.hidden_dim // 2)
        pos_map = pos_map.astype(x_map.dtype)

        tokens = x_map.reshape(b, h * w, cfg.hidden_dim)
        pos_tokens = pos_map.reshape(b, h * w, cfg.hidden_dim)
        flat_valid = c5_valid.reshape(b, h * w)

        enc_tokens = self.encoder(tokens, pos_tokens, flat_valid, deterministic=not train)

        # fine positional embedding: pos * encoder.pos_scale(encoder output)
        # — the model reaches into the encoder's shared MLP (model.py:89-97)
        fine_pos = pos_tokens * self.encoder.pos_scale(enc_tokens)

        enc_map = enc_tokens.reshape(b, h, w, cfg.hidden_dim)
        fine_pos_map = fine_pos.reshape(b, h, w, cfg.hidden_dim)

        selected_objects, selected_centers, det_output = self.mini_detector(
            enc_map, fine_pos_map, c5_valid, train=train
        )

        obj_pos_embed = sine_embed_centers(selected_centers, d_model=cfg.hidden_dim)

        x = self.decoder(
            selected_objects=selected_objects,
            encoder_output=enc_tokens,
            enc_valid_mask=flat_valid,
            fine_pos=fine_pos,
            obj_pos_embed=obj_pos_embed.astype(x_map.dtype),
            selected_centers=selected_centers,
            bbox_embed=self.bbox_embed,
            deterministic=not train,
        )

        c = cfg.hidden_dim
        cls_x, reg_x = x[..., :c], x[..., c:]
        cls_output = self.cls_embed(cls_x)
        tmp = self.bbox_embed(reg_x)
        tmp = tmp.at[..., :2].add(inverse_sigmoid(selected_centers))
        bbox_output = jax.nn.sigmoid(tmp)

        model_output = {
            "pred_class": cls_output.astype(jnp.float32),
            "pred_boxes": bbox_output.astype(jnp.float32),
        }
        det_output = jax.tree.map(lambda t: t.astype(jnp.float32), det_output)
        return model_output, det_output


def build_destr(config: DestrConfig | None = None) -> DESTR:
    """Builder mirroring the reference's ``build_model`` (model.py:136-154);
    checkpoint resume lives in train/checkpoint.py (the reference's in-builder
    raw state-dict load is broken — SURVEY.md §3.4)."""
    return DESTR(config or DestrConfig())
