"""Losses, matching, and metrics.

TPU-first re-design of the reference's ``src/utils/criterion.py`` and
``src/utils/matcher.py``: everything here is a pure function over padded,
static-shape arrays — no per-image Python loops, no host round-trips, no
scipy. Matching runs on device via ``ops/assignment.py``.

Padded target convention (replacing the reference's tuple-of-dicts /
ragged-list targets):

    DESTR: {"boxes": (B, T, 4) xyxy in [0, 1],
            "labels": (B, T) int32,
            "valid": (B, T) bool}
    SSD:   {"boxes": (B, T, 4) cxcyhw in [0, 1],   # h-before-w, like the ref
            "labels": (B, T) int32,
            "valid": (B, T) bool}
"""

from .criterion import set_criterion, ssd_criterion
from .matcher import hungarian_match, ssd_match
from .metrics import MeanAveragePrecision

__all__ = [
    "set_criterion",
    "ssd_criterion",
    "hungarian_match",
    "ssd_match",
    "MeanAveragePrecision",
]
