"""Static-shape data pipeline.

Replaces the reference's torchvision DataLoader + NestedTensor raggedness
(src/dataset/dataset.py, src/dataset/transforms.py) with:

* host-side readers that decode + letterbox to a fixed canvas and pad
  targets to ``(max_targets, 4)`` + validity mask (no per-batch max-size
  repadding, no tuple-of-dict targets);
* device-side, jit-compiled augmentation (random resized crop, flip, SSD
  random patch, ImageNet normalize) operating on whole batches — the
  reference runs these per image on CPU workers
  (src/dataset/transforms.py:121-182).

Batch contract everywhere downstream:
    {"images": (B, S, S, 3) float32,
     "boxes": (B, T, 4) xyxy (DESTR) or cxcyhw (SSD) in [0, 1],
     "labels": (B, T) int32, "valid": (B, T) bool}
"""

from .datasets import (
    CocoDetection,
    SyntheticDetection,
    VocDetection,
    WiderFaceDetection,
    build_dataset,
)
from .device_cache import DeviceCachedLoader
from .loader import DetectionLoader
from .transforms import (
    destr_eval_transform,
    destr_train_transform,
    normalize_imagenet,
    ssd_eval_transform,
    ssd_train_transform,
)

__all__ = [
    "SyntheticDetection",
    "WiderFaceDetection",
    "VocDetection",
    "CocoDetection",
    "build_dataset",
    "DetectionLoader",
    "DeviceCachedLoader",
    "destr_train_transform",
    "destr_eval_transform",
    "ssd_train_transform",
    "ssd_eval_transform",
    "normalize_imagenet",
]
