"""Auction assignment vs scipy Hungarian: total-cost parity on random matrices.

Per SURVEY.md §4(e): tolerance is on total assignment cost, not permutation
identity (ties make permutations non-unique).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from object_detection_destr_tpu.ops import auction_assignment, batched_assignment


def _total_cost(cost, rows, col_valid):
    m = cost.shape[1]
    return sum(cost[rows[j], j] for j in range(m) if col_valid[j])


@pytest.mark.parametrize("n,m,seed", [(10, 4, 0), (50, 15, 1), (100, 30, 2), (400, 60, 3)])
def test_matches_scipy_total_cost(n, m, seed):
    rng = np.random.default_rng(seed)
    cost = rng.uniform(-2, 2, (n, m)).astype(np.float32)
    col_valid = np.ones(m, bool)

    rows = np.asarray(auction_assignment(jnp.asarray(cost), jnp.asarray(col_valid)))
    # feasibility: distinct rows
    assert len(set(rows.tolist())) == m

    r_sp, c_sp = linear_sum_assignment(cost.T @ np.eye(m) if False else cost)
    # scipy assigns min(n, m) pairs; with n >= m it matches every column
    sp_cost = cost[r_sp, c_sp].sum()
    got_cost = _total_cost(cost, rows, col_valid)
    # near-optimality: within 1% of range * m of optimal
    tol = 0.01 * (cost.max() - cost.min()) * m
    assert got_cost <= sp_cost + tol, f"auction {got_cost} vs scipy {sp_cost}"


def test_respects_column_validity():
    rng = np.random.default_rng(4)
    cost = rng.uniform(0, 1, (20, 8)).astype(np.float32)
    col_valid = np.array([True] * 5 + [False] * 3)
    rows = np.asarray(auction_assignment(jnp.asarray(cost), jnp.asarray(col_valid)))
    valid_rows = rows[:5]
    assert len(set(valid_rows.tolist())) == 5  # valid cols get distinct rows

    # optimal over the valid 5 columns only
    r_sp, c_sp = linear_sum_assignment(cost[:, :5])
    sp_cost = cost[r_sp, c_sp].sum()
    got = _total_cost(cost, rows, col_valid)
    assert got <= sp_cost + 0.05


def test_batched():
    rng = np.random.default_rng(5)
    cost = rng.uniform(0, 1, (4, 30, 10)).astype(np.float32)
    col_valid = np.ones((4, 10), bool)
    col_valid[2, 7:] = False
    rows = np.asarray(batched_assignment(jnp.asarray(cost), jnp.asarray(col_valid)))
    assert rows.shape == (4, 10)
    for b in range(4):
        mv = col_valid[b].sum()
        assert len(set(rows[b, :mv].tolist())) == mv
        r_sp, c_sp = linear_sum_assignment(cost[b][:, :mv])
        sp = cost[b][r_sp, c_sp].sum()
        got = _total_cost(cost[b], rows[b], col_valid[b])
        assert got <= sp + 0.05 * mv


def test_single_target():
    cost = np.array([[3.0], [1.0], [2.0]], np.float32)
    rows = np.asarray(auction_assignment(jnp.asarray(cost), jnp.asarray([True])))
    assert rows[0] == 1  # picks the cheapest row


def test_square_permutation():
    rng = np.random.default_rng(6)
    cost = rng.uniform(0, 10, (12, 12)).astype(np.float32)
    rows = np.asarray(auction_assignment(jnp.asarray(cost), jnp.ones(12, bool)))
    assert sorted(rows.tolist()) == list(range(12))
    r_sp, c_sp = linear_sum_assignment(cost)
    sp = cost[r_sp, c_sp].sum()
    got = _total_cost(cost, rows, np.ones(12, bool))
    assert got <= sp + 0.1 * 12


@pytest.mark.parametrize("n,m,seed", [(25, 8, 0), (400, 32, 1), (50, 50, 2)])
def test_pallas_kernel_matches_scipy_total_cost(n, m, seed):
    """The single-launch Pallas auction (interpret mode on CPU) solves to
    the same eps-optimality as the XLA reference path."""
    from object_detection_destr_tpu.ops.pallas.auction import (
        auction_assignment_pallas,
    )

    rng = np.random.default_rng(seed)
    b = 3
    cost = (rng.normal(size=(b, n, m)) * 3).astype(np.float32)
    valid = rng.uniform(size=(b, m)) > 0.2
    rows = np.asarray(
        auction_assignment_pallas(jnp.asarray(cost), jnp.asarray(valid))
    )
    for i in range(b):
        v = valid[i]
        sel = rows[i][v]
        assert len(set(sel.tolist())) == len(sel)  # duplicate-free
        assert (sel >= 0).all() and (sel < n).all()
        r_sp, c_sp = linear_sum_assignment(cost[i][:, v])
        sp = cost[i][:, v][r_sp, c_sp].sum()
        got = _total_cost(cost[i], rows[i], v)
        assert got <= sp + 0.05 * abs(sp) + 0.1


def test_pallas_kernel_padding_and_blocks():
    """Non-multiple-of-128 N and batch sizes hitting each block-size branch."""
    from object_detection_destr_tpu.ops.pallas.auction import (
        auction_assignment_pallas,
    )

    rng = np.random.default_rng(3)
    for b in (1, 2, 6):
        cost = (rng.normal(size=(b, 37, 5)) * 2).astype(np.float32)
        valid = np.ones((b, 5), bool)
        rows = np.asarray(
            auction_assignment_pallas(jnp.asarray(cost), jnp.asarray(valid))
        )
        for i in range(b):
            assert len(set(rows[i].tolist())) == 5
            r_sp, c_sp = linear_sum_assignment(cost[i])
            sp = cost[i][r_sp, c_sp].sum()
            got = _total_cost(cost[i], rows[i], valid[i])
            assert got <= sp + 0.05 * abs(sp) + 0.1


@pytest.mark.parametrize("n,t,c,seed", [(25, 8, 2, 0), (400, 32, 2, 1), (60, 10, 5, 2)])
def test_fused_hungarian_kernel_matches_two_step(n, t, c, seed):
    """hungarian_match_pallas (cost built in VMEM) must reproduce
    batched_assignment(hungarian_cost_matrix(...)) — identical total cost
    on random problems, interpret mode."""
    import jax

    from object_detection_destr_tpu.losses.matcher import hungarian_cost_matrix
    from object_detection_destr_tpu.ops.assignment import batched_assignment
    from object_detection_destr_tpu.ops.pallas.auction import (
        hungarian_match_pallas,
    )

    rng = np.random.default_rng(seed)
    b = 3
    logits = rng.normal(size=(b, n, c)).astype(np.float32)
    pb = np.stack(
        [rng.uniform(0.2, 0.8, (b, n)), rng.uniform(0.2, 0.8, (b, n)),
         rng.uniform(0.05, 0.4, (b, n)), rng.uniform(0.05, 0.4, (b, n))], -1
    ).astype(np.float32)
    raw = rng.uniform(0, 1, (b, t, 4)).astype(np.float32)
    tb = np.stack(
        [np.minimum(raw[..., 0], raw[..., 2]), np.minimum(raw[..., 1], raw[..., 3]),
         np.maximum(raw[..., 0], raw[..., 2]), np.maximum(raw[..., 1], raw[..., 3])],
        -1,
    )
    lab = rng.integers(0, c, (b, t)).astype(np.int32)
    valid = rng.uniform(size=(b, t)) > 0.2
    outputs = {"pred_class": jnp.asarray(logits), "pred_boxes": jnp.asarray(pb)}
    targets = {"boxes": jnp.asarray(tb), "labels": jnp.asarray(lab),
               "valid": jnp.asarray(valid)}
    cost = np.asarray(hungarian_cost_matrix(outputs, targets))
    rows_ref = np.asarray(
        batched_assignment(jnp.asarray(cost), targets["valid"])
    )
    rows_fused = np.asarray(
        hungarian_match_pallas(
            outputs["pred_class"], outputs["pred_boxes"], targets["boxes"],
            targets["labels"], targets["valid"],
        )
    )
    for i in range(b):
        v = valid[i]
        cf = cost[i][rows_fused[i][v], np.where(v)[0]].sum()
        cr = cost[i][rows_ref[i][v], np.where(v)[0]].sum()
        assert abs(cf - cr) <= 0.01 * abs(cr) + 1e-3
        assert len(set(rows_fused[i][v].tolist())) == v.sum()


def test_pick_bb_vmem_sizing():
    """Batch-block selection keeps ~6 live (Bb, M, Np) f32 buffers within
    the VMEM budget (the t=300 CLI config OOMed at the old fixed Bb=8)."""
    from object_detection_destr_tpu.ops.pallas.auction import _pick_bb

    assert _pick_bb(16, 32, 512) == 16  # bench shape: fits at full block
    bb = _pick_bb(8, 304, 384)  # CLI shape that OOMed at bb=8
    assert bb is not None and bb * 304 * 384 * 4 * 6 <= 13 * 1024 * 1024
    assert _pick_bb(1, 304, 1152) == 1  # dilated 1333px shape fits at 1
    assert _pick_bb(3, 304, 384) == 1  # odd batches divide down to 1
    # fused-path accounting (ADVICE r2): extra operand bytes and the larger
    # live-buffer count shrink the block for big class counts instead of
    # letting the kernel exceed the budget at compile
    cp, np_ = 96, 512  # COCO-scale classes, 640px tokens
    extra = (cp * np_ + 8 * np_ + 8 * 384 + 3 * 304) * 4
    bb_fused = _pick_bb(8, 304, 512, extra_bytes_per_item=extra, bufs=8)
    assert bb_fused is not None
    assert bb_fused * (8 * 304 * 512 * 4 + extra) <= 13 * 1024 * 1024
    assert bb_fused <= _pick_bb(8, 304, 512)  # never larger than the plain pick


def test_fused_kernel_cli_shape_t300():
    """The production CLI shape (top_k/max_targets 300) through the fused
    kernel (interpret) — the exact configuration that hit the VMEM OOM and
    the rank-2 block divisibility error on hardware."""
    from object_detection_destr_tpu.losses.matcher import hungarian_cost_matrix
    from object_detection_destr_tpu.ops.assignment import batched_assignment
    from object_detection_destr_tpu.ops.pallas.auction import (
        hungarian_match_pallas,
    )

    rng = np.random.default_rng(7)
    b, n, t = 4, 300, 300
    logits = rng.normal(size=(b, n, 2)).astype(np.float32)
    pb = np.stack(
        [rng.uniform(0.2, 0.8, (b, n)), rng.uniform(0.2, 0.8, (b, n)),
         rng.uniform(0.05, 0.4, (b, n)), rng.uniform(0.05, 0.4, (b, n))], -1
    ).astype(np.float32)
    raw = rng.uniform(0, 1, (b, t, 4)).astype(np.float32)
    tb = np.stack(
        [np.minimum(raw[..., 0], raw[..., 2]), np.minimum(raw[..., 1], raw[..., 3]),
         np.maximum(raw[..., 0], raw[..., 2]), np.maximum(raw[..., 1], raw[..., 3])],
        -1,
    )
    valid = np.zeros((b, t), bool)
    valid[:, :12] = True  # typical: few real targets in a 300-slot pad
    outputs = {"pred_class": jnp.asarray(logits), "pred_boxes": jnp.asarray(pb)}
    targets = {"boxes": jnp.asarray(tb), "labels": jnp.zeros((b, t), jnp.int32),
               "valid": jnp.asarray(valid)}
    rows = np.asarray(
        hungarian_match_pallas(
            outputs["pred_class"], outputs["pred_boxes"], targets["boxes"],
            targets["labels"], targets["valid"],
        )
    )
    cost = np.asarray(hungarian_cost_matrix(outputs, targets))
    rows_ref = np.asarray(batched_assignment(jnp.asarray(cost), targets["valid"]))
    for i in range(b):
        v = valid[i]
        cf = cost[i][rows[i][v], np.where(v)[0]].sum()
        cr = cost[i][rows_ref[i][v], np.where(v)[0]].sum()
        assert abs(cf - cr) <= 0.01 * abs(cr) + 1e-3
        assert len(set(rows[i][v].tolist())) == v.sum()


def test_fused_kernel_row_valid_stacking():
    """row_valid lets two problems with different real row counts share one
    launch (VERDICT r2 #2: the dual-solve fusion in _match_pair). The
    stacked+masked solve must equal per-problem solves."""
    import jax.numpy as jnp

    from object_detection_destr_tpu.ops.pallas.auction import (
        hungarian_match_pallas,
    )

    rng = np.random.default_rng(21)
    b, t, c = 4, 6, 2
    n1, n2 = 12, 20
    n = max(n1, n2)

    def problem(nn_):
        logits = rng.normal(size=(b, nn_, c)).astype(np.float32)
        boxes = np.stack(
            [
                rng.uniform(0.3, 0.7, size=(b, nn_)),
                rng.uniform(0.3, 0.7, size=(b, nn_)),
                rng.uniform(0.1, 0.3, size=(b, nn_)),
                rng.uniform(0.1, 0.3, size=(b, nn_)),
            ],
            -1,
        ).astype(np.float32)
        return jnp.asarray(logits), jnp.asarray(boxes)

    l1, b1 = problem(n1)
    l2, b2 = problem(n2)
    tb = jnp.asarray(
        np.sort(rng.uniform(0.1, 0.9, size=(b, t, 4)).astype(np.float32), -1)
    )
    tl = jnp.zeros((b, t), jnp.int32)
    tv = jnp.asarray(rng.random((b, t)) > 0.2)

    r1 = hungarian_match_pallas(l1, b1, tb, tl, tv, interpret=True)
    r2 = hungarian_match_pallas(l2, b2, tb, tl, tv, interpret=True)

    pad = lambda x, nn_: jnp.pad(x, ((0, 0), (0, n - nn_)) + ((0, 0),) * (x.ndim - 2))
    iota = np.arange(n)[None, :]
    rowv = jnp.asarray(
        np.concatenate(
            [np.broadcast_to(iota < n1, (b, n)), np.broadcast_to(iota < n2, (b, n))], 0
        )
    )
    stacked = hungarian_match_pallas(
        jnp.concatenate([pad(l1, n1), pad(l2, n2)], 0),
        jnp.concatenate([pad(b1, n1), pad(b2, n2)], 0),
        jnp.concatenate([tb, tb], 0),
        jnp.concatenate([tl, tl], 0),
        jnp.concatenate([tv, tv], 0),
        interpret=True,
        row_valid=rowv,
    )
    np.testing.assert_array_equal(np.asarray(stacked[:b]), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(stacked[b:]), np.asarray(r2))
    # no padded row may ever be assigned to a valid target
    assert np.all(np.asarray(stacked[:b])[np.asarray(tv)] < n1)
    assert np.all(np.asarray(stacked[b:])[np.asarray(tv)] < n2)
