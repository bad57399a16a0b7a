"""Torch-checkpoint -> flax parameter converters for the backbones.

The reference loads torchvision ImageNet weights for ResNet-50
(backbone.py:124-145) and VGG-16 (model_ssd.py:137-149). For the +-0.3 mAP
parity target (SURVEY.md §7 hard part 5) the TPU build must be able to start
from the same weights: these converters map a torch ``state_dict`` (tensors
or numpy arrays, torch OIHW conv layout) onto the flax param trees of
``models/resnet.py`` / ``models/ssd.py`` (NHWC/HWIO), with FrozenBN buffers
carried bit-for-bit into the ``frozen`` (zero-LR) parameter slots.

No torchvision dependency: the converters consume the plain key/value layout
of ``torchvision.models.resnet50().state_dict()`` /
``vgg16().features.state_dict()``, which users export themselves with
``torch.save({k: v.numpy() for k, v in sd.items()}, ...)``.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import numpy as np

__all__ = [
    "resnet_params_from_torch",
    "vgg16_params_from_torch",
    "destr_encoder_params_from_torch",
    "destr_decoder_params_from_torch",
]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_kernel(t) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def _bn(sd: Mapping[str, Any], prefix: str) -> dict:
    return {
        "weight": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
        "running_mean": _np(sd[f"{prefix}.running_mean"]),
        "running_var": _np(sd[f"{prefix}.running_var"]),
    }


def resnet_params_from_torch(
    sd: Mapping[str, Any], stage_sizes: Sequence[int] = (3, 4, 6, 3)
) -> dict:
    """Map a torchvision ResNet state_dict to the ``models/resnet.ResNet``
    param tree (use as ``params["backbone"]`` in the DESTR model).

    Key mapping:
        conv1.weight                  -> conv1/kernel (HWIO)
        bn1.*                         -> bn1/*
        layerS.I.convJ.weight         -> layer{S}_{I}/convJ/kernel
        layerS.I.bnJ.*                -> layer{S}_{I}/bnJ/*
        layerS.I.downsample.0.weight  -> layer{S}_{I}/downsample_conv/kernel
        layerS.I.downsample.1.*       -> layer{S}_{I}/downsample_bn/*
    (fc.* is dropped — the backbone is headless, backbone.py:101.)
    """
    params: dict = {
        "conv1": {"kernel": _conv_kernel(sd["conv1.weight"])},
        "bn1": _bn(sd, "bn1"),
    }
    for stage, blocks in enumerate(stage_sizes, start=1):
        for i in range(blocks):
            scope = f"layer{stage}_{i}"
            tp = f"layer{stage}.{i}"
            block = {}
            for j in (1, 2, 3):
                block[f"conv{j}"] = {"kernel": _conv_kernel(sd[f"{tp}.conv{j}.weight"])}
                block[f"bn{j}"] = _bn(sd, f"{tp}.bn{j}")
            if f"{tp}.downsample.0.weight" in sd:
                block["downsample_conv"] = {
                    "kernel": _conv_kernel(sd[f"{tp}.downsample.0.weight"])
                }
                block["downsample_bn"] = _bn(sd, f"{tp}.downsample.1")
            params[scope] = block
    return params


def _linear(sd: Mapping[str, Any], prefix: str, bias: bool = True) -> dict:
    """torch Linear (out, in) -> flax Dense kernel (in, out) [+ bias]."""
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping[str, Any], prefix: str) -> dict:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def destr_encoder_params_from_torch(sd: Mapping[str, Any], num_blocks: int = 6) -> dict:
    """Map the reference DESTR ``Encoder`` state_dict (encoder_block.py:8-112)
    onto ``models/destr/encoder.Encoder``'s param tree.

    torch ``nn.MultiheadAttention`` packs q/k/v into ``in_proj_weight``
    (3C, C) — split row-wise into our separate q/k/v Dense kernels. The
    reference's dead ``_proj_to_{q,k,v}`` Linears (never called,
    encoder_block.py:76-82) are dropped.
    """
    params: dict = {
        "pos_scale": {
            "fc0": _linear(sd, "_pos_scale.0"),
            "fc1": _linear(sd, "_pos_scale.2"),
        },
        "outer_norm": _layernorm(sd, "norm"),
    }
    for i in range(num_blocks):
        tp = f"_encoder.{i}"
        w = _np(sd[f"{tp}.self_attn.in_proj_weight"])  # (3C, C)
        b = _np(sd[f"{tp}.self_attn.in_proj_bias"])  # (3C,)
        c = w.shape[1]
        attn = {
            "q_proj": {"kernel": w[:c].T, "bias": b[:c]},
            "k_proj": {"kernel": w[c : 2 * c].T, "bias": b[c : 2 * c]},
            "v_proj": {"kernel": w[2 * c :].T, "bias": b[2 * c :]},
            "out_proj": _linear(sd, f"{tp}.self_attn.out_proj"),
        }
        params[f"block{i}"] = {
            "self_attn": attn,
            "fc1": _linear(sd, f"{tp}.fc1"),
            "fc2": _linear(sd, f"{tp}.fc2"),
            "norm1": _layernorm(sd, f"{tp}.norm1"),
            "norm2": _layernorm(sd, f"{tp}.norm2"),
        }
    return params


def destr_decoder_params_from_torch(sd: Mapping[str, Any], num_blocks: int = 6) -> dict:
    """Map the reference DESTR ``Decoder`` state_dict (decoder_block.py:12-274)
    onto ``models/destr/decoder.Decoder``'s param tree (all self/cross
    projection Linears are bias-free in both)."""
    params: dict = {
        "pos_scale": {
            "fc0": _linear(sd, "_pos_scale.0"),
            "fc1": _linear(sd, "_pos_scale.2"),
        },
        "outer_norm": _layernorm(sd, "norm"),
    }
    proj_map = {
        "sa_q_obj": "_sa_proj_to_q_obj",
        "sa_q_pos": "_sa_proj_to_q_pos",
        "sa_k_obj": "_sa_proj_to_k_obj",
        "sa_k_pos": "_sa_proj_to_k_pos",
        "sa_v_obj": "_sa_proj_to_v_obj",
        "ca_q_obj": "_ca_proj_to_q_obj",
        "ca_q_pos": "_ca_proj_to_q_pos",
        "ca_k_enc": "_ca_proj_to_k_enc",
        "ca_k_pos": "_ca_proj_to_k_pos",
        "ca_v_enc": "_ca_proj_to_v_enc",
    }
    for i in range(num_blocks):
        tp = f"_decoder.{i}"
        block: dict = {
            ours: _linear(sd, f"{tp}.{theirs}", bias=False)
            for ours, theirs in proj_map.items()
        }
        block["norm1"] = _layernorm(sd, f"{tp}.norm1")
        block["norm2"] = _layernorm(sd, f"{tp}.norm2")
        for branch, theirs in (("cls_branch", "_cls_branch"), ("reg_branch", "_reg_branch")):
            block[branch] = {
                "fc1": _linear(sd, f"{tp}.{theirs}.fc1"),
                "fc2": _linear(sd, f"{tp}.{theirs}.fc2"),
                "norm1": _layernorm(sd, f"{tp}.{theirs}.norm1"),
                "norm2": _layernorm(sd, f"{tp}.{theirs}.norm2"),
            }
        params[f"block{i}"] = block
    return params


# conv layer indices of vgg16().features[:23] (conv1_1 .. conv4_3)
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21)


def vgg16_params_from_torch(sd: Mapping[str, Any]) -> dict:
    """Map ``vgg16().features`` (or full-model ``features.``-prefixed) keys to
    the ``models/ssd.VGG16Features`` param tree (use as ``params["backbone"]``).
    """
    prefix = "features." if any(k.startswith("features.") for k in sd) else ""
    params = {}
    for our_i, torch_i in enumerate(_VGG16_CONV_IDX):
        params[f"conv{our_i}"] = {
            "kernel": _conv_kernel(sd[f"{prefix}{torch_i}.weight"]),
            "bias": _np(sd[f"{prefix}{torch_i}.bias"]),
        }
    return params
