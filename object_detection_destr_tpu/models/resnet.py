"""ResNet backbone with frozen batch normalization (NHWC, flax linen).

TPU-native re-design of the reference's torchvision ResNet-50 +
FrozenBatchNorm2d backbone (backbone.py:29-145):

* NHWC layout — convolutions tile directly onto the MXU.
* FrozenBN is algebraically folded to a per-channel ``x * scale + bias``
  (the reference does the same reshuffle for fuser-friendliness,
  backbone.py:69-79); here the four buffers are kept as parameters in a
  ``frozen_bn`` scope so the optimizer masks them to zero LR, preserving
  checkpoint-convertibility from torchvision state dicts.
* Freezing policy mirrors backbone.py:92-99: the stem and layer1 never train;
  layer2/3/4 train iff ``lr_backbone > 0`` (handled by optimizer param
  labels, see train/optim.py).
* ``dilation=True`` replaces layer4's stride with dilation-2 convs
  (reference flag ``--dilation`` wired at backbone.py:139-143), doubling C5
  resolution for the high-res config (BASELINE.json config 4).

Returns all four stage outputs like the reference's
``IntermediateLayerGetter(return_layers={layer1..layer4})`` (backbone.py:101).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

__all__ = ["ResNet", "FrozenBatchNorm", "resnet50", "resnet101", "downsample_mask"]


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine params.

    y = x * scale + bias where scale = gamma / sqrt(var + eps),
    bias = beta - mean * scale (backbone.py:69-79). All four tensors live as
    (masked, untrained) parameters initialized to identity. The folded
    scale/shift are computed in f32 and cast to the activation dtype, so
    bf16 activations stay bf16.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight * (var + self.eps) ** -0.5
        shift = bias - mean * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class SpaceToDepthStem(nn.Module):
    """The 7x7/s2 stem conv, computed as a 4x4/s1 conv over a 2x2
    space-to-depth input (the MLPerf ResNet stem transform).

    The reference runs torchvision's ``conv1`` directly
    (backbone.py:29-145 via torchvision resnet); a 7x7 conv over 3
    channels starves the MXU (measured 7.4 TFLOP/s — the 3-channel
    contraction is padded out to a full tile). Rewriting it over the
    2x2 space-to-depth input raises the contraction to 4*4*12 and is
    *algebraically exact*: with the kernel zero-padded to 8x8 at the
    leading edge, output[i,j] = sum_{A,B} w2[A,B] . x2[i+A-2, j+B-2]
    where x2 is the depth-packed input and
    w2[A,B,(p,q,c)] = pad(w)[2A+p, 2B+q, c].

    The parameter keeps the torchvision shape (7,7,3,64) under the
    standard ``kernel`` name, so checkpoint conversion and the frozen-BN
    folding are untouched; the transform runs per call (a few hundred
    FLOPs on a 9.4k-element tensor).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, 64), jnp.float32
        )
        # w2[A,B,(p,q,c),o] = pad(w)[2A+p, 2B+q, c, o]
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        w2 = kp.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
        w2 = w2.reshape(4, 4, 12, 64)

        b, h, w, c = x.shape
        ph, pw = h % 2, w % 2  # appended zero rows land in the conv's pad zone
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            h, w = h + ph, w + pw
        x2 = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        x2 = x2.reshape(b, h // 2, w // 2, 4 * c)
        return lax.conv_general_dilated(
            x2.astype(self.dtype),
            w2.astype(self.dtype),
            window_strides=(1, 1),
            padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with expansion 4 (torchvision topology)."""

    features: int  # bottleneck width; output = features * 4
    strides: int = 1
    dilation: int = 1
    project: bool = False
    dtype: jnp.dtype = jnp.float32  # computation dtype (params stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.strides, self.strides),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(self.features * 4, name="bn3")(y)
        if self.project:
            residual = nn.Conv(
                self.features * 4,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = FrozenBatchNorm(self.features * 4, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Multi-stage ResNet returning {"layer1".."layer4"} NHWC feature maps."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # resnet50
    dilation: bool = False  # dilate layer4 instead of striding
    dtype: jnp.dtype = jnp.float32
    s2d_stem: bool = True  # exact space-to-depth stem rewrite (MXU-friendly)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        # stem: 7x7/2 conv + frozen BN + 3x3/2 maxpool
        if self.s2d_stem:
            y = SpaceToDepthStem(dtype=self.dtype, name="conv1")(x)
        else:
            y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)], use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(64, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outputs = {}
        widths = (64, 128, 256, 512)
        for stage, (blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            dilate = self.dilation and stage == 3
            stride = 1 if stage == 0 or dilate else 2
            for blk in range(blocks):
                y = Bottleneck(
                    width,
                    strides=stride if blk == 0 else 1,
                    dilation=2 if (dilate and blk > 0) else 1,
                    project=(blk == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{blk}",
                )(y)
            outputs[f"layer{stage + 1}"] = y
        return outputs


def resnet50(dilation: bool = False, dtype: jnp.dtype = jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), dilation=dilation, dtype=dtype)


def resnet101(dilation: bool = False, dtype: jnp.dtype = jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), dilation=dilation, dtype=dtype)


def downsample_mask(valid_mask: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor downsample of a (B, H, W) bool mask.

    Matches torch ``F.interpolate(mode='nearest')`` indexing
    (backbone.py:113): ``src = floor(dst * H / h)``.
    """
    b, h_in, w_in = valid_mask.shape
    h_out, w_out = out_hw
    ri = (jnp.arange(h_out) * h_in) // h_out
    ci = (jnp.arange(w_out) * w_in) // w_out
    return valid_mask[:, ri][:, :, ci]
