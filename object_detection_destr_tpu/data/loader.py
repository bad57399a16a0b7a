"""Batching host loader: fixed canvas, padded targets, deterministic order.

Replaces the reference's ``torch.utils.data.DataLoader`` + collate functions
(src/dataset/dataset.py:143-161) with a dependency-free iterator that:

* resizes every decoded image to one fixed square canvas (device-side crops
  do the rest — no per-batch max-size NestedTensor padding, misc.py:26-45);
* pads targets to ``(max_targets, 4)`` + bool validity mask;
* implements virtual epoch expansion (``len = base * augment_factor``,
  index mod base — dataset.py:33-37);
* is deterministically seekable: ``state_dict()/load_state_dict()`` capture
  (epoch, step) so checkpoint resume replays the exact data order
  (SURVEY.md §5: the reference loses the epoch on crash);
* overlaps host decode with device compute via a background prefetch thread.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

__all__ = ["DetectionLoader"]


def _resize_canvas(image: np.ndarray, canvas: int) -> np.ndarray:
    """Resize HWC uint8 to (canvas, canvas, 3). cv2 when available (3-5x
    faster than PIL), PIL fallback."""
    try:
        import cv2

        return cv2.resize(image, (canvas, canvas), interpolation=cv2.INTER_LINEAR)
    except Exception:
        from PIL import Image

        return np.asarray(
            Image.fromarray(image).resize((canvas, canvas), Image.BILINEAR)
        )


def _letterbox_canvas(image: np.ndarray, canvas: int):
    """Aspect-preserving resize onto a zero (canvas, canvas, 3) canvas,
    content pasted top-left. Returns (canvas_image, fh, fw) where fh/fw are
    the content extents as fractions of the canvas.

    Unlike :func:`_resize_canvas` (the square stretch, which distorts
    non-square images), this keeps the reference's eval geometry reachable
    (src/dataset/transforms.py:170-181 preserves aspect ratio) at the cost of
    real zero padding — which downstream transforms expose as a pixel
    validity mask.
    """
    ih, iw = image.shape[:2]
    scale = canvas / max(ih, iw)
    nh = max(int(round(ih * scale)), 1)
    nw = max(int(round(iw * scale)), 1)
    try:
        import cv2

        resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    except Exception:
        from PIL import Image

        resized = np.asarray(Image.fromarray(image).resize((nw, nh), Image.BILINEAR))
    out = np.zeros((canvas, canvas, 3), np.uint8)
    out[:nh, :nw] = resized
    return out, nh / canvas, nw / canvas


class DetectionLoader:
    """Iterate padded numpy batches.

    Batch: {"images": (B, C, C, 3) uint8, "boxes": (B, T, 4) xyxy norm,
            "labels": (B, T) int32, "valid": (B, T) bool}

    With ``letterbox=True`` images are aspect-preserving-resized and pasted
    top-left on a zero canvas instead of stretched; the batch gains
    "content_hw": (B, 2) float32 content-extent fractions, and boxes are
    re-normalized to canvas coordinates (content occupies [0, fh] x [0, fw]).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        canvas_size: int = 672,
        max_targets: int = 300,
        augment_factor: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        prefetch: int = 2,
        num_workers: int = 8,
        letterbox: bool = False,
        mesh=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.canvas_size = canvas_size
        self.letterbox = letterbox
        self.max_targets = max_targets
        self.augment_factor = max(augment_factor, 1)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_workers = num_workers
        self._pool = ThreadPoolExecutor(num_workers) if num_workers > 0 else None
        self.epoch = 0
        self._start_step = 0
        self._step = 0  # state_dict() must work before the first __iter__
        # with a mesh, the prefetch thread device_puts each batch (leading
        # axis sharded on 'data') so the host->device transfer overlaps the
        # previous step's compute instead of serializing before dispatch
        self.mesh = mesh

    @property
    def num_samples(self) -> int:
        return len(self.dataset) * self.augment_factor

    def __len__(self) -> int:
        n = self.num_samples
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    # ---- deterministic resume ------------------------------------------
    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "step": self._step}

    def load_state_dict(self, state: dict) -> None:
        self.epoch = int(state["epoch"])
        self._start_step = int(state["step"])
        self._step = self._start_step  # keep state_dict() a fixed point

    # ---- iteration ------------------------------------------------------
    def _epoch_order(self) -> np.ndarray:
        order = np.arange(self.num_samples)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
        return order

    def _make_batch(self, idxs: np.ndarray) -> dict:
        c, t = self.canvas_size, self.max_targets
        b = len(idxs)
        boxes = np.zeros((b, t, 4), np.float32)
        labels = np.zeros((b, t), np.int32)
        valid = np.zeros((b, t), bool)
        from ..runtime import native as _native

        if self.letterbox:
            fetch = lambda vi: self.dataset[int(vi) % len(self.dataset)]
            if self._pool is not None:
                items = list(self._pool.map(fetch, idxs))
            else:
                items = [fetch(i) for i in idxs]
            images = np.zeros((b, c, c, 3), np.uint8)
            content_hw = np.zeros((b, 2), np.float32)
            for j, (img, bx, lb) in enumerate(items):
                images[j], fh, fw = _letterbox_canvas(img, c)
                content_hw[j] = (fh, fw)
                n = min(len(bx), t)
                if n:
                    # original-normalized -> canvas-normalized coordinates
                    boxes[j, :n] = bx[:n] * np.asarray(
                        [fw, fh, fw, fh], np.float32
                    )
                    labels[j, :n] = lb[:n]
                    valid[j, :n] = True
            return {
                "images": images, "boxes": boxes, "labels": labels,
                "valid": valid, "content_hw": content_hw,
            }

        # fastest path: fused native JPEG decode + canvas resize, one call per
        # batch (runtime/cc/jpeg_decode.cc) — available when the dataset can
        # hand out raw JPEG bytes with pre-normalized annotations
        if _native.is_available() and hasattr(self.dataset, "raw_item"):
            try:
                fetch_raw = lambda vi: self.dataset.raw_item(int(vi) % len(self.dataset))
                if self._pool is not None:
                    items = list(self._pool.map(fetch_raw, idxs))
                else:
                    items = [fetch_raw(i) for i in idxs]
                for j, (_, bx, lb) in enumerate(items):
                    n = min(len(bx), t)
                    if n:
                        boxes[j, :n] = bx[:n]
                        labels[j, :n] = lb[:n]
                        valid[j, :n] = True
                images = _native.batch_decode_resize([it[0] for it in items], c)
                return {"images": images, "boxes": boxes, "labels": labels, "valid": valid}
            except (AttributeError, ValueError):
                pass  # non-JPEG files or decode failure: decoded-array path

        # per-item fetch (decode + annotation parse) fans out over a thread
        # pool: image decode releases the GIL, and the serial fetch loop was
        # measured to dominate the real training loop (150x the device step)
        fetch = lambda virtual_idx: self.dataset[int(virtual_idx) % len(self.dataset)]
        if self._pool is not None:
            items = list(self._pool.map(fetch, idxs))
        else:
            items = [fetch(i) for i in idxs]
        raw_images = []
        for j, (img, bx, lb) in enumerate(items):
            raw_images.append(img)
            n = min(len(bx), t)
            if n:
                boxes[j, :n] = bx[:n]
                labels[j, :n] = lb[:n]
                valid[j, :n] = True
        # native C++ thread-pool resize when built (runtime/), cv2/PIL fallback
        if _native.is_available():
            images = _native.batch_resize(raw_images, c)
        else:
            images = np.zeros((b, c, c, 3), np.uint8)
            for j, img in enumerate(raw_images):
                images[j] = _resize_canvas(img, c)
        return {"images": images, "boxes": boxes, "labels": labels, "valid": valid}

    def __iter__(self) -> Iterator[dict]:
        order = self._epoch_order()
        n_batches = len(self)
        start = self._start_step
        self._start_step = 0

        if self.mesh is not None:
            from ..parallel.mesh import shard_batch

            to_device = lambda b: shard_batch(b, self.mesh)
        else:
            to_device = lambda b: b

        def batches():
            for step in range(start, n_batches):
                self._step = step + 1
                lo = step * self.batch_size
                yield to_device(self._make_batch(order[lo : lo + self.batch_size]))
            self.epoch += 1
            self._step = 0

        self._step = start
        if self.prefetch <= 0:
            yield from batches()
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def worker():
            try:
                for item in batches():
                    q.put(item)
            finally:
                q.put(sentinel)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        th.join()
