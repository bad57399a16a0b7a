"""SSD single-shot detector: VGG-16 backbone + 6-scale pyramid + conv heads.

Re-design of the reference SSD (model_ssd.py:6-155), NHWC/TPU-first:

* backbone = VGG-16 ``features[:23]`` — conv1_1 .. conv4_3+ReLU, three
  floor-mode 2x2 max-pools, so a 300px input yields a 37x37 map
  (model_ssd.py:137-149). The training-side grids [37,19,10,5,3,1]
  (matcher.py:214) are therefore consistent; the orphan NMS module's 38
  (non_maximum_suppress.py:33) is the inconsistent one — see REFCOMPAT.md.
* 5 extra feature blocks: 1x1 reduce + 3x3 (stride-2 for the first three,
  valid-padding for the last two), all conv-BN-ReLU, bias-free
  (model_ssd.py:49-98). Channels 512 -> 1024 -> 512 -> 256 -> 256 -> 256.
* per-scale 3x3 heads: boxes ``A*4``, confidences ``A*(num_cls+1)``.
  REFCOMPAT: the reference double-counts background (``num_class+1`` twice,
  model_ssd.py:10+35, wasting a dead channel); here the background class is
  counted once — channel ``num_cls`` is background.
* outputs per scale are (B, H, W, A, ·) like the reference's permuted layout
  (model_ssd.py:113-125).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ...config import SSDConfig

__all__ = ["SSD", "VGG16Features", "build_ssd"]

_VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512)


class VGG16Features(nn.Module):
    """VGG-16 feature trunk through conv4_3 + ReLU (torchvision features[:23])."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv_i = 0
        for v in _VGG_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))  # floor mode
            else:
                x = nn.relu(nn.Conv(v, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv{conv_i}")(x))
                conv_i += 1
        return x  # (B, H/8, W/8, 512)


class ExtraBlock(nn.Module):
    """1x1 reduce + 3x3 conv (stride-2 SAME, or stride-1 VALID), conv-BN-ReLU."""

    mid: int
    out: int
    stride2: bool
    dtype: jnp.dtype = jnp.float32
    bn_axis_name: str | None = None  # see DestrConfig.bn_axis_name

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None, name=name,
        )
        x = nn.relu(bn("bn1")(nn.Conv(self.mid, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)))
        if self.stride2:
            x = nn.Conv(self.out, (3, 3), strides=(2, 2), padding="SAME", use_bias=False, dtype=self.dtype, name="conv2")(x)
        else:
            x = nn.Conv(self.out, (3, 3), padding="VALID", use_bias=False, dtype=self.dtype, name="conv2")(x)
        return nn.relu(bn("bn2")(x))


class SSD(nn.Module):
    config: SSDConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        """images: (B, H, W, 3) NHWC.

        Returns:
            {"boxes": [6 x (B, Hs, Ws, A, 4)],
             "conf":  [6 x (B, Hs, Ws, A, num_cls + 1)]}
        """
        cfg = self.config
        num_conf = cfg.num_cls + 1  # + background (REFCOMPAT: counted once)

        compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        x = VGG16Features(dtype=compute_dtype, name="backbone")(images.astype(compute_dtype))

        features = [x]
        dims = [(1024, 1024), (256, 512), (128, 256), (128, 256), (128, 256)]
        for i, (mid, out) in enumerate(dims):
            x = ExtraBlock(mid, out, stride2=(i < 3), dtype=compute_dtype,
                           bn_axis_name=cfg.bn_axis_name, name=f"extra{i}")(x, train)
            features.append(x)

        outputs = {"boxes": [], "conf": []}
        for i, (ft, num_a) in enumerate(zip(features, cfg.anchors_per_scale)):
            b, h, w, _ = ft.shape
            # heads stay f32 (box offsets need the precision); bf16 input upcasts
            box = nn.Conv(num_a * 4, (3, 3), padding="SAME", name=f"box_head{i}")(ft)
            conf = nn.Conv(num_a * num_conf, (3, 3), padding="SAME", name=f"conf_head{i}")(ft)
            outputs["boxes"].append(box.reshape(b, h, w, num_a, 4).astype(jnp.float32))
            outputs["conf"].append(conf.reshape(b, h, w, num_a, num_conf).astype(jnp.float32))
        return outputs


def build_ssd(config: SSDConfig | None = None) -> SSD:
    """Builder mirroring the reference's ``build_model`` (model_ssd.py:152-155)."""
    return SSD(config or SSDConfig())
