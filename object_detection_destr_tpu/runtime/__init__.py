"""Native (C++) host runtime pieces.

The reference has zero native code (SURVEY.md §2.3); this package provides
the TPU build's host-side native components — currently the multithreaded
batch resize/pack core feeding the data loader. Python falls back to
cv2/PIL automatically when the shared library is unavailable.
"""

from .native import batch_resize, is_available

__all__ = ["batch_resize", "is_available"]
