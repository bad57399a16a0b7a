"""One-dispatch training epochs: scan the whole epoch on device.

With ``--device_cache`` every decoded canvas already lives in HBM and the
augmentation pipeline is a jitted device transform (data/transforms.py), so
nothing about a training epoch needs the host: this module compiles
gather -> augment -> train_step -> EMA for a FULL epoch into one
``lax.scan`` program. The per-step driver loop pays one dispatch per step —
on a relay/tunnel-attached chip that RTT (~0.3-1 s) dwarfs the ~25 ms
device step, so a 128-step epoch costs minutes of wall clock for ~3 s of
device work (BASELINE.md r5). The scanned epoch pays ONE dispatch and
returns the per-step metrics stacked; wall time approaches device time.

The reference's hot loop re-enters Python every step by construction
(src/train/train.py:96-138: scipy matcher, per-loss ``.item()`` fetches);
this mode is the opposite end of the design space and is only possible
because every stage here (decode cache, augmentation, matching, optimizer)
is already device-resident.

Numerics: single-device ``epoch_scan`` replays the per-step path's batch
order (the same ``(seed, epoch)`` Philox stream via DeviceCachedLoader.
epoch_index_matrix), augmentation key stream (``fold_in(aug_rng, step)``),
and step math. The scanned program is a DIFFERENT XLA compilation though,
so fusion-level rounding (~1e-5 relative on the SSD class loss) is not
bit-identical — through chaotic selections (hard-negative mining sorts,
Hungarian ties) trajectories decorrelate over steps exactly as a pool-host
migration does (CLAUDE.md cross-host cache note). tests/test_epoch_scan.py
asserts per-step agreement at step granularity and end-to-end health; the
stub-core tests (no chaotic ops) assert full-trajectory equivalence. Under a >1-shard mesh the whole
scan runs inside one ``shard_map`` (batch axis sharded, the step's
collectives unchanged); the augmentation key then additionally folds in
``axis_index`` so shards draw independent augmentations — a different (but
equal-distribution) key stream from the global-batch split the per-step
path uses.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["make_epoch_runner"]


def make_epoch_runner(
    step_core: Callable,
    transform: Callable,
    ema_decay: Optional[float] = None,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Build ``run(state, ema_params, data, order, base_step, aug_key)``.

    Args:
        step_core: the UNWRAPPED train step ``(state, batch) -> (state,
            metrics)`` from ``make_*_train_step(..., wrap=False)`` — built
            with the same ``mesh`` so its collectives match.
        transform: ``(raw_batch_dict, key) -> model_batch_dict`` — the
            jitted device augmentation, already bound to its geometry.
        ema_decay: when set, the runner carries the parameter EMA through
            the scan (same math as driver._make_ema).
        mesh: ``None`` -> plain jit; a mesh -> one shard_map over the whole
            epoch with the batch axis of ``order`` sharded on 'data'.

    Returns a jitted callable; ``state`` and ``ema_params`` are donated.
    ``order`` is ``(n_steps, local_batch)`` int32 cache indices;
    ``base_step`` the host step count at epoch start (traced, so epochs
    don't recompile); ``aug_key`` the augmentation PRNG key. Output:
    ``(state, ema_params, metrics)`` with each metric stacked ``(n_steps,)``.
    """
    axis = "data" if mesh is not None else None

    def run(state, ema_params, data, order, base_step, aug_key):
        def body(carry, xs):
            st, ema = carry
            idx, i = xs
            batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), data)
            key = jax.random.fold_in(aug_key, base_step + i)
            if axis is not None:
                key = jax.random.fold_in(key, jax.lax.axis_index(axis))
            st, metrics = step_core(st, transform(batch, key))
            if ema is not None:
                ema = jax.tree.map(
                    lambda e, p: e * ema_decay
                    + p.astype(e.dtype) * (1.0 - ema_decay),
                    ema,
                    st.params,
                )
            return (st, ema), metrics

        steps = jnp.arange(order.shape[0], dtype=jnp.int32)
        (state, ema_params), stacked = jax.lax.scan(
            body, (state, ema_params), (order, steps)
        )
        return state, ema_params, stacked

    if mesh is None:
        return jax.jit(run, donate_argnums=(0, 1))
    from jax.experimental.shard_map import shard_map

    smapped = shard_map(
        run,
        mesh=mesh,
        # state/ema/data replicated; order's batch axis sharded; metrics are
        # already the global (pmean/psum'd) values -> replicated out
        in_specs=(P(), P(), P(), P(None, "data"), P(), P()),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(smapped, donate_argnums=(0, 1))
