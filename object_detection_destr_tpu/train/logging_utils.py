"""Metric logging without per-step host syncs.

The reference calls ``.item()`` on four losses every step (train.py:169-188)
— a device round-trip per step. Here metrics stay on device as lazy jax
arrays; the logger batches ``device_get`` once per log interval and emits to
stdout + JSONL (+ TensorBoard scalars when available, mirroring the
reference's tag scheme ``Loss/train/...``, train.py:96-116, 205-208)."""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import numpy as np

__all__ = ["MetricLogger"]


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, use_tensorboard: bool = True):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir)
                except Exception:
                    self._tb = None
        self._pending: list[tuple[int, dict]] = []
        self._t0 = time.time()

    def accumulate(self, step: int, metrics: dict) -> None:
        """Store lazy device metrics; nothing is fetched here."""
        self._pending.append((step, metrics))

    def flush(self, prefix: str = "train", echo: bool = True) -> dict:
        """Fetch all pending metrics in one transfer; log the running mean."""
        if not self._pending:
            return {}
        fetched = jax.device_get([m for _, m in self._pending])
        last_step = self._pending[-1][0]
        keys = fetched[0].keys()
        means = {k: float(np.mean([f[k] for f in fetched])) for k in keys}
        self._pending.clear()

        record = {
            "step": int(last_step),
            "prefix": prefix,
            "time": round(time.time() - self._t0, 3),
            **{k: round(v, 6) for k, v in means.items()},
        }
        if self._jsonl:
            self._jsonl.write(json.dumps(record) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in means.items():
                self._tb.add_scalar(f"Loss/{prefix}/{k}", v, int(last_step))
        if echo:
            body = " ".join(f"{k}={v:.4f}" for k, v in means.items())
            print(f"[{prefix} step {last_step}] {body}", flush=True)
        return means

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb:
            self._tb.add_scalar(tag, value, step)
        if self._jsonl:
            self._jsonl.write(
                json.dumps({"step": int(step), "tag": tag, "value": float(value)}) + "\n"
            )
            self._jsonl.flush()

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
