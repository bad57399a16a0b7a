"""Auction assignment as ONE Pallas TPU kernel.

Why: the ``lax.while_loop`` auction (ops/assignment.py) is algorithmically
right but executionally wrong for TPU — profiling the b8/640 train step
showed ~42 ms/step inside the matcher: ~30 XLA fusions per bidding round x
~32 rounds x ~37 us launch overhead each, plus an 8 ms sequential greedy
completion loop (BASELINE.md r2 profile table). The tensors are tiny
((M, N) = (32, 400) per problem), so the cost is *kernel launches*, not
math. Here the entire solve — every bidding round and the completion pass —
runs inside a single kernel with all state resident in VMEM, so a round
costs microseconds of VPU time instead of ~1 ms of launch overhead. As a
bonus the convergence check runs every round (the XLA path only checked
every 8 unrolled rounds), so typical problems stop at ~10 rounds.

Algorithm and semantics match ``ops/assignment._auction_single`` (Bertsekas
forward auction, single phase from zero prices, eps-optimality bound
``cost(S) <= cost* + M * eps``; greedy completion for cap-hit/invalid
columns). Scatter-free formulation: every "x[i] = v" of the reference
algorithm is a one-hot masked max/argmax — VPU-native, no gathers.

Replaces the scipy host solve of the reference (matcher.py:107-119) at the
same call site; validated against scipy for total cost in
tests/test_assignment.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["auction_assignment_pallas"]

_BIG = 1e9


def _elast(mask):
    """mask[..., None] for bool masks — Mosaic only supports minor-dim
    insertion on 32-bit types, so expand through f32."""
    return mask.astype(jnp.float32)[..., None] > 0


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(value_ref, colv_ref, out_ref, *, n_real: int, m_real: int,
            eps_frac: float, max_iters: int):
    value = value_ref[:]  # (Bb, M, Np) f32; padded rows already at -_BIG
    colv = colv_ref[:] > 0  # (Bb, M)
    bb, m, np_ = value.shape

    iota_n = jax.lax.broadcasted_iota(jnp.int32, (bb, m, np_), 2)
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (bb, m, np_), 1)
    row_real = iota_n[:, :1, :] < n_real  # (Bb, 1, Np)
    col_real = (
        jax.lax.broadcasted_iota(jnp.int32, (bb, m), 1) < m_real
    )  # (Bb, M)
    colv = colv & col_real

    # eps from the value range of the real region, matching the XLA path:
    # invalid columns contribute 0 rows there (value zeroed), so fold a 0
    # into the range exactly when an invalid column exists.
    real = row_real & _elast(colv)
    has_inv = jnp.any(~colv & col_real, axis=1, keepdims=True)  # (Bb, 1)
    # multi-axis reductions SIGABRT the Mosaic compiler — reduce one axis at
    # a time; -_BIG stands in for inf (the padded value floor), keeping every
    # intermediate finite and 2-D
    vmax = jnp.max(jnp.max(jnp.where(real, value, -_BIG), axis=2), axis=1,
                   keepdims=True)  # (Bb, 1)
    vmin = jnp.min(jnp.min(jnp.where(real, value, _BIG), axis=2), axis=1,
                   keepdims=True)
    vmax = jnp.maximum(vmax, jnp.where(has_inv, 0.0, -_BIG))
    vmin = jnp.minimum(vmin, jnp.where(has_inv, 0.0, _BIG))
    value_range = jnp.maximum(vmax - vmin, 1e-6)  # (Bb, 1)
    eps = eps_frac * value_range

    def cond(state):
        _, _, roc, it = state
        return jnp.any((roc < 0) & colv) & (it < max_iters)

    def body(state):
        prices, owner, roc, it = state
        net = value - prices[:, None, :]  # (Bb, M, Np)
        best_v = jnp.max(net, axis=-1)  # (Bb, M)
        best_i = jnp.argmax(net, axis=-1).astype(jnp.int32)
        onehot = iota_n == best_i[..., None]  # (Bb, M, Np)
        net2 = jnp.where(onehot, -_BIG, net)
        second_v = jnp.maximum(
            jnp.max(net2, axis=-1), best_v - value_range - 1.0
        )
        bid = best_v - second_v + eps  # (Bb, M)

        bidding = (roc < 0) & colv  # (Bb, M)
        sel_price = jnp.max(
            jnp.where(onehot, prices[:, None, :], -_BIG), axis=-1
        )  # (Bb, M)
        bid_price = jnp.where(bidding, sel_price + bid, -_BIG)

        bidmat = jnp.where(
            onehot & _elast(bidding), bid_price[..., None], -_BIG
        )  # (Bb, M, Np)
        row_bids = jnp.max(bidmat, axis=1)  # (Bb, Np)
        got = row_bids > -_BIG / 2  # (Bb, Np)
        win_col = jnp.argmax(bidmat, axis=1).astype(jnp.int32)  # (Bb, Np)

        # evict current owners of rows that received bids
        evict = jnp.any(
            (got & (owner >= 0))[:, None, :] & (owner[:, None, :] == iota_m),
            axis=2,
        )  # (Bb, M)
        roc = jnp.where(evict, -1, roc)

        # install winners (scatter-free: max/argmax over the win matrix)
        win_mask = got[:, None, :] & (win_col[:, None, :] == iota_m)
        won_any = jnp.any(win_mask, axis=2)  # (Bb, M)
        # Mosaic argmax lowers only for f32 operands — cast the bool mask
        win_row = jnp.argmax(
            win_mask.astype(jnp.float32), axis=2
        ).astype(jnp.int32)  # (Bb, M)
        roc = jnp.where(won_any, win_row, roc)

        owner = jnp.where(got, win_col, owner)
        prices = jnp.where(got, row_bids, prices)
        return prices, owner, roc, it + 1

    init = (
        jnp.zeros((bb, np_), jnp.float32),
        jnp.full((bb, np_), -1, jnp.int32),
        jnp.full((bb, m), -1, jnp.int32),
        jnp.int32(0),
    )
    _, _, roc, _ = jax.lax.while_loop(cond, body, init)

    # greedy completion: duplicate-free even at the iteration cap
    iota_n2 = jax.lax.broadcasted_iota(jnp.int32, (bb, np_), 1)
    taken = jnp.any(
        (iota_n == roc[..., None]) & _elast(roc >= 0), axis=1
    )  # (Bb, Np)
    row_free = ~taken

    # mask-select formulation: Mosaic has no dynamic_slice on values, so
    # "column j" is picked with a one-hot mask + reduce instead of roc[:, j]
    iota_cols = jax.lax.broadcasted_iota(jnp.int32, (bb, m), 1)

    def fill(j, carry):
        roc, row_free_i = carry  # row_free carried as int32: Mosaic fails
        row_free = row_free_i > 0  # to legalize mixed f32/bool loop carries
        col_mask = iota_cols == j  # (Bb, M)
        cur = jnp.max(
            jnp.where(col_mask, roc, jnp.int32(-(2**30))), axis=1
        )  # (Bb,) = roc[:, j]
        needs = cur < 0
        vj = jnp.max(
            jnp.where(_elast(col_mask), value, -_BIG * 2), axis=1
        )  # (Bb, Np) = value[:, j, :]
        scores = jnp.where(row_free, vj, -_BIG)
        pick = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # (Bb,)
        new_col = jnp.where(needs, pick, cur)
        roc = jnp.where(col_mask, new_col[:, None], roc)
        row_free = row_free & ~(_elast(needs) & (iota_n2 == pick[:, None]))
        return roc, row_free.astype(jnp.int32)

    roc, _ = jax.lax.fori_loop(0, m, fill, (roc, row_free.astype(jnp.int32)))
    out_ref[:] = roc


@partial(
    jax.jit,
    static_argnames=("eps_frac", "max_iters", "interpret"),
)
def auction_assignment_pallas(
    cost: jnp.ndarray,
    col_valid: jnp.ndarray,
    eps_frac: float = 0.001,
    max_iters: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in Pallas equivalent of ``ops.assignment.batched_assignment``.

    Args:
        cost: (B, N, M) float cost matrices, N >= M (rows = queries,
            cols = targets).
        col_valid: (B, M) bool.

    Returns:
        (B, M) int32 row assigned to each column (duplicate-free).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, m = cost.shape

    # benefit-maximization form, invalid columns zeroed (matches the XLA
    # path), padded to lane/sublane multiples; fake rows sit at -_BIG so no
    # column ever bids on them and completion only reaches them when real
    # rows are exhausted (impossible: N >= M)
    value = jnp.where(col_valid[:, :, None], -jnp.swapaxes(cost, 1, 2), 0.0)
    value = value.astype(jnp.float32)
    np_ = _round_up(n, 128)
    mp = _round_up(m, 8)
    value = jnp.pad(value, ((0, 0), (0, mp - m), (0, np_ - n)),
                    constant_values=-_BIG)
    colv = jnp.pad(col_valid.astype(jnp.int32), ((0, 0), (0, mp - m)))

    # block the batch so VMEM stays bounded at large B
    bb = next(g for g in (16, 8, 4, 2, 1) if b % g == 0)

    out = pl.pallas_call(
        partial(_kernel, n_real=n, m_real=m, eps_frac=eps_frac,
                max_iters=max_iters),
        out_shape=jax.ShapeDtypeStruct((b, mp), jnp.int32),
        grid=(b // bb,),
        in_specs=[
            pl.BlockSpec((bb, mp, np_), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, mp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, mp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(value, colv)
    return out[:, :m]
