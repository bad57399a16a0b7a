"""Batched, device-resident inference/post-processing.

The reference's only "serving" surface is an orphan NMS module exercised by
its own ``__main__`` (non_maximum_suppress.py:105-128, never wired into an
entry point — SURVEY.md §3.5). Here both models get a real predict path with
fixed-size outputs + validity masks, fully on device.
"""

from .predict import destr_predict, ssd_predict

__all__ = ["destr_predict", "ssd_predict"]
