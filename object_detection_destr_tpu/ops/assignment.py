"""On-device linear-sum-assignment via the auction algorithm.

This is the JIT-compatible replacement for the reference's per-image host
round-trip through ``scipy.optimize.linear_sum_assignment``
(matcher.py:107-119, 184-196) — the dominant non-GPU latency of the reference
hot loop (SURVEY.md §3.1).

Design notes:
    * Bertsekas forward auction, **single phase from zero prices**.
      "Persons" are the M target columns (M <= N query rows): each unassigned
      target bids for its best query; conflicting bids resolve by price
      escalation. For the asymmetric case (N > M) starting from zero prices
      is essential: rows never bid on keep price 0, which is exactly the
      condition under which the eps-optimality bound
      ``cost(S) <= cost* + M * eps`` holds. (eps-scaling with price reuse
      across phases is only valid for square problems — restarting phases
      with stale prices on rows that end up unassigned breaks the bound; we
      verified the degradation empirically.)
    * All state is fixed-shape; the whole solve is one ``lax.while_loop``
      batched over images via ``vmap`` — no host syncs, no dynamic shapes.
      Each iteration is a dense (M, N) max + scatter: pure VPU work.
    * Invalid (padded) target columns are masked out and never assigned.
    * A greedy completion pass guarantees a feasible (duplicate-free)
      assignment even if the iteration cap is hit.

Empirically (tests/test_assignment.py) the solve takes < 10 iterations and
matches scipy's total cost to ~1e-4 relative on random matrices up to
(1050, 300).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["auction_assignment", "batched_assignment"]

_BIG = 1e9


def _auction_single(
    cost: jnp.ndarray,
    col_valid: jnp.ndarray,
    eps_frac: float,
    max_iters: int,
    unroll: int = 8,
) -> jnp.ndarray:
    """Solve one assignment problem.

    Args:
        cost: (N, M) — rows = queries, cols = targets; N >= M.
        col_valid: (M,) bool — padded target columns are skipped.
        eps_frac: bid increment as a fraction of the value range; the
            suboptimality bound is ``M * eps_frac * range``.

    Returns:
        (M,) int32 — row assigned to each column (arbitrary but in-range and
        duplicate-free for invalid columns).
    """
    n, m = cost.shape
    value = -cost.T.astype(jnp.float32)  # (M, N) benefit-maximization form
    value = jnp.where(col_valid[:, None], value, 0.0)

    value_range = jnp.maximum(jnp.max(value) - jnp.min(value), 1e-6)
    eps = eps_frac * value_range

    def cond(state):
        _, _, row_of_col, it = state
        return jnp.any((row_of_col < 0) & col_valid) & (it < max_iters)

    def body(state):
        prices, owner_of_row, row_of_col, it = state
        net = value - prices[None, :]  # (M, N)
        best_i = jnp.argmax(net, axis=1)
        best_v = jnp.take_along_axis(net, best_i[:, None], axis=1)[:, 0]
        net2 = net.at[jnp.arange(m), best_i].set(-_BIG)
        second_v = jnp.maximum(jnp.max(net2, axis=1), best_v - value_range - 1.0)
        bid = best_v - second_v + eps  # (M,)

        bidding = (row_of_col < 0) & col_valid
        bid_price = jnp.where(bidding, prices[best_i] + bid, -_BIG)  # (M,)

        # per-row winner: highest bid price
        row_bids = jnp.full((n,), -_BIG, value.dtype).at[best_i].max(bid_price)
        got_bid = row_bids > -_BIG / 2

        # winning column per row (argmax over columns bidding for that row)
        col_score = jnp.where(
            bidding[:, None] & jax.nn.one_hot(best_i, n, dtype=bool),
            bid_price[:, None],
            -_BIG,
        )  # (M, N)
        win_col = jnp.argmax(col_score, axis=0).astype(jnp.int32)  # (N,)

        # evict previous owners of rows that received bids
        prev_owner = owner_of_row
        evicted_col_mask = jnp.any(
            (got_bid & (prev_owner >= 0))[None, :]
            & (prev_owner[None, :] == jnp.arange(m)[:, None]),
            axis=1,
        )
        row_of_col = jnp.where(evicted_col_mask, -1, row_of_col)
        # install winners
        owner_of_row = jnp.where(got_bid, win_col, owner_of_row)
        row_of_col = row_of_col.at[jnp.where(got_bid, win_col, m)].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop"
        )
        prices = jnp.where(got_bid, row_bids, prices)
        return prices, owner_of_row, row_of_col, it + 1

    def body_unrolled(state):
        # several Jacobi bidding rounds per while trip: the per-round tensors
        # are tiny ((M, N) maxes), so loop control overhead dominates on TPU
        # — unrolling cut the measured matcher time ~4x (profile notes in
        # BASELINE.md). A round with no outstanding bids is a no-op, so
        # overshooting past convergence is harmless.
        for _ in range(unroll):
            state = body(state)
        return state

    init = (
        jnp.zeros((n,), jnp.float32),
        jnp.full((n,), -1, jnp.int32),
        jnp.full((m,), -1, jnp.int32),
        jnp.int32(0),
    )
    _, _, row_of_col, _ = jax.lax.while_loop(cond, body_unrolled, init)

    # Completion pass: if the iteration cap left columns unassigned (or for
    # invalid columns), fill greedily with the best still-free row so the
    # result is always a duplicate-free partial permutation.
    assigned = row_of_col >= 0
    row_free = jnp.ones((n,), bool).at[jnp.where(assigned, row_of_col, n)].set(
        False, mode="drop"
    )

    def fill_one(j, carry):
        row_of_col, row_free = carry
        needs = row_of_col[j] < 0
        scores = jnp.where(row_free, value[j], -_BIG)
        pick = jnp.argmax(scores).astype(jnp.int32)
        row_of_col = row_of_col.at[j].set(jnp.where(needs, pick, row_of_col[j]))
        row_free = row_free.at[pick].set(jnp.where(needs, False, row_free[pick]))
        return row_of_col, row_free

    row_of_col, _ = jax.lax.fori_loop(0, m, fill_one, (row_of_col, row_free))
    return row_of_col.astype(jnp.int32)


@partial(jax.jit, static_argnames=("eps_frac", "max_iters"))
def auction_assignment(
    cost: jnp.ndarray,
    col_valid: jnp.ndarray,
    eps_frac: float = 0.001,
    max_iters: int = 256,
) -> jnp.ndarray:
    """Single-problem wrapper; see :func:`batched_assignment`."""
    return _auction_single(cost, col_valid, eps_frac, max_iters)


@partial(jax.jit, static_argnames=("eps_frac", "max_iters"))
def batched_assignment(
    cost: jnp.ndarray,
    col_valid: jnp.ndarray,
    eps_frac: float = 0.001,
    max_iters: int = 256,
) -> jnp.ndarray:
    """Batched min-cost assignment of target columns to query rows.

    On TPU this dispatches to the single-launch Pallas kernel
    (ops/pallas/auction.py): the ``vmap``-of-``while_loop`` form below
    compiles to ~30 tiny fusions per bidding round and measured ~42 ms/step
    of pure launch overhead in the b8/640 train step (BASELINE.md r2
    profile); the kernel runs the whole solve in VMEM in one launch.
    The XLA path remains the CPU/interpret reference implementation.
    Disable the kernel with OBJDET_NO_PALLAS_MATCHER=1.

    Args:
        cost: (B, N, M) float cost matrices, N >= M.
        col_valid: (B, M) bool — True for real targets.

    Returns:
        (B, M) int32: ``rows[b, j]`` is the query assigned to target j
        (in-range and duplicate-free everywhere; meaningful only where
        ``col_valid``).
    """
    import os

    if jax.default_backend() == "tpu" and not os.environ.get(
        "OBJDET_NO_PALLAS_MATCHER"
    ):
        from .pallas.auction import auction_assignment_pallas

        return auction_assignment_pallas(
            cost, col_valid, eps_frac=eps_frac, max_iters=max_iters
        )
    return jax.vmap(lambda c, v: _auction_single(c, v, eps_frac, max_iters))(
        cost, col_valid
    )
