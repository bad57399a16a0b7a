"""Plain-torch rebuilds of the torchvision models the reference loads, plus a
fake ``torchvision`` module so the FULL reference model
(``/root/reference/src/model/model.py``) can be instantiated in this
environment (no torchvision, no network) for whole-model parity tests and
reference-vs-repo A/B training runs.

``TorchResNet`` reproduces ``torchvision.models.resnet50/101`` exactly —
state-dict key layout, v1.5 stride placement, ``replace_stride_with_dilation``
— and additionally honors the ``norm_layer`` argument the reference passes
(its own ``FrozenBatchNorm2d``, backbone.py:135-143).
``torch_vgg16_features`` matches ``vgg16().features[:23]``
(model_ssd.py:141-148).

This file is validation tooling, not framework code: the framework itself
never needs torch.
"""

from __future__ import annotations

import sys
import types
from collections import OrderedDict

import torch

nn = torch.nn

__all__ = [
    "TorchResNet",
    "torch_vgg16_features",
    "install_fake_torchvision",
    "build_reference_destr",
    "build_reference_ssd",
]


class _Bottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3), expansion 4."""

    def __init__(self, inplanes, planes, stride=1, dilation=1, downsample=None,
                 norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = norm_layer(planes)
        self.conv2 = nn.Conv2d(
            planes, planes, 3, stride=stride, padding=dilation, dilation=dilation,
            bias=False,
        )
        self.bn2 = norm_layer(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = norm_layer(planes * 4)
        self.relu = nn.ReLU()
        self.downsample = downsample

    def forward(self, x):
        identity = self.downsample(x) if self.downsample is not None else x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


class TorchResNet(nn.Module):
    """Plain-torch ResNet with torchvision's state-dict key layout and
    ``_make_layer`` semantics (incl. ``replace_stride_with_dilation`` for
    layer4: the dilating stage keeps stride 1, its first block runs conv2 at
    the *previous* dilation and the remaining blocks at dilation 2)."""

    def __init__(self, stage_sizes=(3, 4, 6, 3), dilate_l4=False, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes, dilation = 64, 1
        for stage, (blocks, planes) in enumerate(
            zip(stage_sizes, (64, 128, 256, 512)), start=1
        ):
            stride = 1 if stage == 1 else 2
            prev_dilation = dilation
            if dilate_l4 and stage == 4:
                dilation *= stride
                stride = 1
            downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                norm_layer(planes * 4),
            )
            layers = [
                _Bottleneck(inplanes, planes, stride, prev_dilation, downsample,
                            norm_layer)
            ]
            inplanes = planes * 4
            layers += [
                _Bottleneck(inplanes, planes, 1, dilation, norm_layer=norm_layer)
                for _ in range(blocks - 1)
            ]
            setattr(self, f"layer{stage}", nn.Sequential(*layers))
        self.fc = nn.Linear(2048, 1000)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        out = {}
        for stage in (1, 2, 3, 4):
            x = getattr(self, f"layer{stage}")(x)
            out[f"layer{stage}"] = x
        return out


def torch_vgg16_features():
    """``nn.Sequential`` matching ``vgg16().features[:23]`` key layout
    (conv1_1 .. conv4_3 + ReLU; the slice the reference keeps)."""
    cfg = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512)
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_c, v, 3, padding=1), nn.ReLU()]
            in_c = v
    return nn.Sequential(*layers)


class _IntermediateLayerGetter(nn.ModuleDict):
    """Reimplementation of ``torchvision.models._utils.IntermediateLayerGetter``
    (runs named children in order up to the last requested layer, collecting
    renamed outputs)."""

    def __init__(self, model, return_layers):
        orig = dict(return_layers)
        layers = OrderedDict()
        remaining = dict(return_layers)
        for name, module in model.named_children():
            if not remaining:
                break
            layers[name] = module
            remaining.pop(name, None)
        super().__init__(layers)
        self.return_layers = orig

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


def install_fake_torchvision():
    """Register a minimal ``torchvision`` into ``sys.modules`` exposing
    exactly what ``/root/reference/src/model`` imports: ``models.resnet50/
    resnet101`` (honoring ``replace_stride_with_dilation`` and ``norm_layer``,
    ignoring ``weights`` — no network here), ``models.vgg16``,
    ``models.{ResNet50_Weights,VGG16_Weights}``, and
    ``models._utils.IntermediateLayerGetter``."""
    if "torchvision" in sys.modules:
        return sys.modules["torchvision"]

    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    _utils = types.ModuleType("torchvision.models._utils")

    def _resnet(stage_sizes):
        def build(*, replace_stride_with_dilation=None, weights=None,
                  norm_layer=None, **kwargs):
            del weights, kwargs  # no pretrained download in this environment
            dilate = bool(
                replace_stride_with_dilation and replace_stride_with_dilation[2]
            )
            return TorchResNet(stage_sizes, dilate_l4=dilate, norm_layer=norm_layer)

        return build

    class _Weights:
        DEFAULT = None

    class _VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = torch_vgg16_features()

    models.resnet50 = _resnet((3, 4, 6, 3))
    models.resnet101 = _resnet((3, 4, 23, 3))
    models.vgg16 = lambda weights=None, **kw: _VGG()
    models.ResNet50_Weights = _Weights
    models.ResNet101_Weights = _Weights
    models.VGG16_Weights = _Weights
    models._utils = _utils
    _utils.IntermediateLayerGetter = _IntermediateLayerGetter
    tv.models = models

    # import-time stubs for src/dataset/* (transforms.py:8, dataset.py:4-6):
    # the classes are referenced/subclassed at module import; the A/B and
    # parity harnesses never instantiate them.
    transforms = types.ModuleType("torchvision.transforms")
    v2 = types.ModuleType("torchvision.transforms.v2")

    class _NeverInstantiated:
        def __init__(self, *a, **k):
            raise RuntimeError(
                "fake torchvision: dataset/transform stubs are import-time "
                "placeholders only"
            )

    for name in ("Compose", "ToImage", "ToDtype", "Resize", "CenterCrop",
                 "Normalize", "RandomResizedCrop", "RandomHorizontalFlip"):
        setattr(v2, name, type(name, (_NeverInstantiated,), {}))
    transforms.v2 = v2
    transforms.ToTensor = type("ToTensor", (_NeverInstantiated,), {})
    tv.transforms = transforms

    datasets = types.ModuleType("torchvision.datasets")
    datasets.WIDERFace = type("WIDERFace", (object,), {})
    datasets.VOCDetection = type("VOCDetection", (object,), {})
    tv.datasets = datasets

    tv_tensors = types.ModuleType("torchvision.tv_tensors")
    tv_tensors.BoundingBoxes = type("BoundingBoxes", (_NeverInstantiated,), {})
    tv_tensors.BoundingBoxFormat = type("BoundingBoxFormat", (), {"XYXY": "XYXY"})
    tv.tv_tensors = tv_tensors

    for mod in (tv, models, _utils, transforms, v2, datasets, tv_tensors):
        sys.modules[mod.__name__] = mod
    return tv


def _ensure_reference_importable():
    install_fake_torchvision()
    # the reference annotates with ``torch.Tuple``/``torch.Any``
    # (dataset.py:36, model.py etc.) — aliases that old torch exposed and
    # torch 2.x removed; restore them so its modules import
    import typing

    if not hasattr(torch, "Tuple"):
        torch.Tuple = typing.Tuple
    if not hasattr(torch, "Any"):
        torch.Any = typing.Any
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def build_reference_destr(args):
    """Instantiate the FULL reference ``ObjDetSplitTransformer`` via its own
    ``build_model(args)`` (model.py:136-154) against the fake torchvision.
    ``args`` needs: hidden_dim(=256: the sine pos embed is hardcoded to
    N_steps=128 -> 256-d, position_encoding_cdetr.py:144-150),
    num_encoder_blocks, num_decoder_blocks, top_k, num_cls, lr_backbone,
    resume(False)."""
    _ensure_reference_importable()
    from src.model.model import build_model

    return build_model(args)


def build_reference_ssd(args):
    """Instantiate the reference ``SingleShotDetector`` (model_ssd.py:152-155).
    ``args`` needs: num_cls."""
    _ensure_reference_importable()
    from src.model.model_ssd import build_model

    return build_model(args)


def repair_reference_minidet_bn(model):
    """Rewire the reference MiniDetector's misplaced BatchNorms in place
    (REFCOMPAT #1 / SURVEY §2.1 #6): the reference appends the reg- and
    pos-stack BNs to ``self._cls_conv`` (mini_detector.py:45,58), so its cls
    path runs 4 convs + 12 interleaved BNs while the reg/pos paths run bare
    convs — and its training loss freezes from ~epoch 4 (BASELINE.md r2 A/B).
    The repair moves ``_cls_conv[8+i]`` to reg layer i and ``_cls_conv[12+i]``
    to pos layer i, interleaved conv,BN like the cls stack — the evident
    intent, and exactly the wiring this repo's fixed mini-detector uses (the
    converter routes the same indices, models/convert.py:267-287).

    Parameter objects are moved, not copied, so an optimizer built before or
    after the repair sees the identical parameter set. Call AFTER capturing
    ``state_dict()`` if the defective-layout keys are needed for
    ``destr_variables_from_torch``.
    """
    for md in model.modules():
        if type(md).__name__ != "MiniDetector":
            continue
        if len(md._cls_conv) != 16:
            continue  # already repaired (or a different build)
        mods = list(md._cls_conv)
        md._cls_conv = nn.ModuleList(mods[:8])
        md._reg_conv = nn.ModuleList(
            m for pair in zip(md._reg_conv, mods[8:12]) for m in pair
        )
        md._pos_conv = nn.ModuleList(
            m for pair in zip(md._pos_conv, mods[12:16]) for m in pair
        )
    return model


def zero_reference_dropout(model):
    """Make a reference model deterministic for parity/AB runs: zero every
    ``nn.Dropout.p`` AND the defective in-forward dropout probability of the
    reference's ``SelfAttention`` (self_attention.py:40 constructs a fresh
    ``nn.Dropout`` inside ``forward``, so ``.eval()`` alone cannot disable
    it — REFCOMPAT #2)."""
    for mod in model.modules():
        if isinstance(mod, nn.Dropout):
            mod.p = 0.0
        if hasattr(mod, "_dropout_prob"):
            mod._dropout_prob = 0.0
        if isinstance(mod, nn.MultiheadAttention):
            mod.dropout = 0.0
    return model
