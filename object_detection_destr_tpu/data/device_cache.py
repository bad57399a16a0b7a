"""Device-resident dataset cache: decode once, gather batches on device.

For datasets that fit HBM (uint8 canvases: ~1.35 MB per 672px image, so a
few thousand images cost a few GB), the host pipeline can be removed from
the steady-state loop entirely: every decoded canvas is uploaded ONCE and
each step's batch is an on-device ``jnp.take`` over the epoch order — the
only per-step host->device traffic is the index vector. Augmentation was
already a jitted device transform (data/transforms.py), so the whole
image path (gather -> augment -> model) stays on device.

This matters doubly on a tunneled chip, where the per-step batch transfer
(~11 MB at b8/640) costs ~1.5 s against a ~29 ms device step (BASELINE.md
r1 "End-to-end driver run"); on production hosts it still removes the
host-loop + PCIe/DMA feed from the critical path for small/medium sets.

The reference has no analog (its DataLoader re-decodes every epoch,
src/dataset/dataset.py:33-64); this is a capability extension, enabled by
``DataConfig.device_cache`` / ``--device_cache``.

Batch order parity: the cache reproduces ``DetectionLoader``'s epoch
shuffle exactly (same ``(seed, epoch)`` Philox stream), so cached and
uncached runs see identical data order and checkpoint resume round-trips
between the two paths.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

__all__ = ["DeviceCachedLoader"]


class DeviceCachedLoader:
    """Wrap a :class:`DetectionLoader`; serve its batches from device HBM.

    The base loader contributes its decode/canvas/letterbox logic
    (``_make_batch``) during the one-time build and its configuration
    (batch size, shuffle seed, augment factor, drop_last); afterwards it is
    not touched. Iteration yields dicts of committed jax arrays with the
    same keys the base loader would produce.
    """

    def __init__(self, base, mesh=None, build_chunk: int = 64):
        import jax
        import jax.numpy as jnp

        self.base = base
        self.batch_size = base.batch_size
        self.letterbox = base.letterbox
        self.max_targets = base.max_targets
        self.augment_factor = base.augment_factor
        self.shuffle = base.shuffle
        self.seed = base.seed
        self.drop_last = base.drop_last
        self.epoch = base.epoch
        self._start_step = base._start_step
        self._step = self._start_step

        # ---- one-time build: decode every base item through the base
        # loader's own canvas logic, then commit to device ----------------
        n = len(base.dataset)
        chunks = []
        for lo in range(0, n, build_chunk):
            idxs = np.arange(lo, min(lo + build_chunk, n))
            chunks.append(base._make_batch(idxs))
        host = {
            k: np.concatenate([c[k] for c in chunks], axis=0) for k in chunks[0]
        }
        if mesh is not None:
            from ..parallel.mesh import replicated_sharding

            put = lambda a: jax.device_put(a, replicated_sharding(mesh))
        else:
            put = jax.device_put
        self._data = {k: put(v) for k, v in host.items()}
        self._gather = jax.jit(
            lambda data, idx: jax.tree.map(lambda a: jnp.take(a, idx, axis=0), data)
        )

    # ---- DetectionLoader-compatible surface ----------------------------
    @property
    def num_samples(self) -> int:
        return len(self.base.dataset) * self.augment_factor

    def __len__(self) -> int:
        n = self.num_samples
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "step": self._step}

    def load_state_dict(self, state: dict) -> None:
        self.epoch = int(state["epoch"])
        self._start_step = int(state["step"])
        self._step = self._start_step  # keep state_dict() a fixed point

    def _epoch_order(self) -> np.ndarray:
        # identical stream to DetectionLoader._epoch_order
        order = np.arange(self.num_samples)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
        return order

    # ---- scanned-epoch surface (train/epoch_scan.py) --------------------
    @property
    def data(self) -> dict:
        """The committed device-resident dataset arrays (read-only)."""
        return self._data

    def epoch_index_matrix(self) -> "tuple[int, np.ndarray]":
        """Peek this epoch's batch order as one rectangular index matrix.

        Returns ``(start_step, idx)`` with ``idx`` of shape
        ``(n_batches - start_step, batch_size)`` int32 base-dataset indices —
        the exact batches ``__iter__`` would yield (same ``(seed, epoch)``
        Philox stream), in one array so a ``lax.scan`` can consume the whole
        epoch. Does NOT advance bookkeeping: call :meth:`advance_epoch`
        after the scanned epoch completes, so an interrupt mid-epoch leaves
        the loader state consistent with the (pre-epoch) model state.
        """
        if not self.drop_last and (self.num_samples % self.batch_size):
            raise ValueError(
                "epoch_scan needs rectangular batches: enable drop_last or "
                "size the dataset divisibly by batch_size"
            )
        base_n = len(self.base.dataset)
        order = self._epoch_order() % base_n
        n_batches = len(self)
        start = self._start_step
        idx = order[start * self.batch_size : n_batches * self.batch_size]
        return start, idx.reshape(n_batches - start, self.batch_size).astype(
            np.int32
        )

    def advance_epoch(self) -> None:
        """Commit the bookkeeping for one completed scanned epoch."""
        self._start_step = 0
        self._step = 0
        self.epoch += 1

    def __iter__(self) -> Iterator[dict]:
        import jax.numpy as jnp

        base_n = len(self.base.dataset)
        order = self._epoch_order() % base_n  # virtual -> base index
        n_batches = len(self)
        start = self._start_step
        self._start_step = 0
        self._step = start
        for step in range(start, n_batches):
            self._step = step + 1
            lo = step * self.batch_size
            idx = jnp.asarray(order[lo : lo + self.batch_size], jnp.int32)
            yield self._gather(self._data, idx)
        self.epoch += 1
        self._step = 0
