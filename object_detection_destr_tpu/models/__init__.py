from . import destr, ssd
from .resnet import FrozenBatchNorm, ResNet, downsample_mask, resnet50, resnet101

__all__ = [
    "FrozenBatchNorm",
    "ResNet",
    "destr",
    "downsample_mask",
    "resnet50",
    "resnet101",
    "ssd",
]
