"""Fused flat-vector AdamW vs the per-leaf optax path (VERDICT r2 #2a).

Same math by construction (AdamW is elementwise); these tests pin the
per-group policy (main / backbone / frozen labels -> per-element lr vector)
and multi-step numerical agreement so the TPU default can switch to the
fused form without changing training behavior.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from object_detection_destr_tpu.train.optim import (  # noqa: E402
    build_optimizer,
    fused_adamw,
    grouped_adamw,
    param_labels,
)


def _toy_params(rng):
    # a params tree exercising all three label groups
    return {
        "backbone": {
            "conv_stem": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 8)), jnp.float32)},
            "layer1": {"conv0": {"kernel": jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)}},
            "layer3": {
                "conv0": {"kernel": jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)},
                "bn0": {"scale": jnp.ones((16,), jnp.float32)},
            },
        },
        "head": {
            "dense": {
                "kernel": jnp.asarray(rng.normal(size=(16, 4)), jnp.float32),
                "bias": jnp.zeros((4,), jnp.float32),
            }
        },
    }


def _run(tx, params, grads_seq):
    state = tx.init(params)
    for g in grads_seq:
        upd, state = tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
    return params


def test_fused_matches_per_leaf_multi_step():
    rng = np.random.default_rng(0)
    params = _toy_params(rng)
    grads_seq = [
        jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
        )
        for _ in range(4)
    ]
    ref = _run(
        build_optimizer(params, lr=1e-3, lr_backbone=1e-4, fused=False),
        params, grads_seq,
    )
    fus = _run(
        build_optimizer(params, lr=1e-3, lr_backbone=1e-4, fused=True),
        params, grads_seq,
    )
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(fus)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)


def test_fused_matches_with_backbone_frozen():
    rng = np.random.default_rng(1)
    params = _toy_params(rng)
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
    )
    for lr_backbone in (0.0, 5e-4):
        ref = _run(
            build_optimizer(params, lr=1e-3, lr_backbone=lr_backbone, fused=False),
            params, [grads],
        )
        fus = _run(
            build_optimizer(params, lr=1e-3, lr_backbone=lr_backbone, fused=True),
            params, [grads],
        )
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(fus)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
            )


def test_fused_freezes_frozen_and_scales_groups():
    rng = np.random.default_rng(2)
    params = _toy_params(rng)
    tx = fused_adamw(params, lr=1e-3, lr_backbone=1e-4)
    state = tx.init(params)
    grads = jax.tree.map(lambda p: jnp.ones_like(p), params)
    upd, _ = tx.update(grads, state, params)
    flat_u = jax.tree.leaves(upd)
    flat_l = jax.tree.leaves(param_labels(params))
    for u, lab in zip(flat_u, flat_l):
        u = np.asarray(u)
        if lab == "frozen":
            assert np.all(u == 0.0), "frozen leaves must not move"
        else:
            assert np.any(u != 0.0)


def _blocky_params(rng):
    # repeated-shape leaves across sibling scopes — the case grouped_adamw
    # stacks (e.g. the six decoder blocks' identical weight matrices)
    def block():
        return {
            "attn": {"kernel": jnp.asarray(rng.normal(size=(16, 16)), jnp.float32)},
            "ffn": {
                "kernel": jnp.asarray(rng.normal(size=(16, 32)), jnp.float32),
                "bias": jnp.zeros((32,), jnp.float32),
            },
        }

    p = _toy_params(rng)
    p["decoder"] = {f"block{i}": block() for i in range(4)}
    return p


def test_grouped_matches_per_leaf_multi_step():
    rng = np.random.default_rng(7)
    params = _blocky_params(rng)
    grads_seq = [
        jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
        )
        for _ in range(4)
    ]
    for lr_backbone in (1e-4, 0.0):
        ref = _run(
            build_optimizer(params, lr=1e-3, lr_backbone=lr_backbone, fused=False),
            params, grads_seq,
        )
        grp = _run(
            build_optimizer(params, lr=1e-3, lr_backbone=lr_backbone, fused="grouped"),
            params, grads_seq,
        )
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(grp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
            )


def test_grouped_matches_per_leaf_with_schedule():
    # lr-drop schedules (tools/ab_reference.py --lr-drop) must agree with the
    # per-leaf optax.scale_by_schedule semantics (evaluated pre-increment)
    rng = np.random.default_rng(8)
    params = _blocky_params(rng)
    grads_seq = [
        jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
        )
        for _ in range(5)
    ]
    lr = lambda step: 1e-3 * jnp.where(step >= 3, 0.1, 1.0)  # noqa: E731
    lr_bb = lambda step: 1e-4 * jnp.where(step >= 3, 0.1, 1.0)  # noqa: E731
    ref = _run(
        build_optimizer(params, lr=lr, lr_backbone=lr_bb, fused=False),
        params, grads_seq,
    )
    grp = _run(
        build_optimizer(params, lr=lr, lr_backbone=lr_bb, fused="grouped"),
        params, grads_seq,
    )
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(grp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5)


def test_grouped_state_shapes_and_frozen():
    rng = np.random.default_rng(9)
    params = _blocky_params(rng)
    tx = grouped_adamw(params, lr=1e-3, lr_backbone=1e-4)
    state = tx.init(params)
    # the four identical decoder blocks must share stacked groups: every
    # stacked moment's leading dim counts its group's leaves, and the total
    # stacked element count equals the trainable (non-frozen) element count
    labels = jax.tree.leaves(param_labels(params))
    leaves = jax.tree.leaves(params)
    trainable = sum(l.size for l, lab in zip(leaves, labels) if lab != "frozen")
    assert sum(m.size for m in state.m) == trainable
    assert any(m.shape[0] == 4 for m in state.m), "block leaves should stack 4-deep"
    grads = jax.tree.map(lambda p: jnp.ones_like(p), params)
    upd, _ = tx.update(grads, state, params)
    for u, lab in zip(jax.tree.leaves(upd), labels):
        u = np.asarray(u)
        if lab == "frozen":
            assert np.all(u == 0.0)
        else:
            assert np.any(u != 0.0)


def test_grouped_update_under_donation():
    # regression: init_fn once aliased m and v to the SAME zero buffers,
    # which trips XLA's "donate the same buffer twice" check the moment the
    # train step donates the optimizer state (caught by the CLI drive)
    rng = np.random.default_rng(10)
    params = _blocky_params(rng)
    tx = grouped_adamw(params, lr=1e-3, lr_backbone=1e-4)
    state = tx.init(params)
    leaves = jax.tree.leaves(state)
    bufs = [l.unsafe_buffer_pointer() for l in leaves if hasattr(l, "unsafe_buffer_pointer")]
    assert len(bufs) == len(set(bufs)), "optimizer state leaves must not alias"
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
    )

    @jax.jit
    def step(state, params, grads):
        upd, state = tx.update(grads, state, params)
        return jax.tree.map(lambda p, u: p + u, params, upd), state

    donating = jax.jit(step, donate_argnums=(0, 1))
    p1, s1 = donating(state, params, grads)
    p2, s2 = donating(s1, p1, grads)
    assert int(s2.count) == 2
    for leaf in jax.tree.leaves(p2):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_fused_update_under_jit_and_donation():
    rng = np.random.default_rng(3)
    params = _toy_params(rng)
    tx = fused_adamw(params, lr=1e-3, lr_backbone=1e-4)
    state = tx.init(params)
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
    )

    @jax.jit
    def step(state, params, grads):
        upd, state = tx.update(grads, state, params)
        return jax.tree.map(lambda p, u: p + u, params, upd), state

    p1, s1 = step(state, params, grads)
    p2, s2 = step(s1, p1, grads)
    assert int(s2.count) == 2
    for leaf in jax.tree.leaves(p2):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_compact_f32_moments_match_optax_exactly():
    """scale_by_adam_compact at moment_dtype=f32 is the SAME math as
    optax's scale_by_adam chain (the builder maps 'float32' to the plain
    optax path, so drive the compact transform directly): pins the
    re-derived math before narrowing the storage dtype."""
    import optax

    from object_detection_destr_tpu.train.optim import scale_by_adam_compact

    rng = np.random.default_rng(11)
    params = _toy_params(rng)
    grads_seq = [
        jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
        )
        for _ in range(4)
    ]
    ref_tx = optax.chain(
        optax.scale_by_adam(),
        optax.add_decayed_weights(0.01),
        optax.scale_by_learning_rate(1e-3),
    )
    cmp_tx = optax.chain(
        scale_by_adam_compact(moment_dtype=jnp.float32),
        optax.add_decayed_weights(0.01),
        optax.scale_by_learning_rate(1e-3),
    )
    ref = _run(ref_tx, params, grads_seq)
    cmp_ = _run(cmp_tx, params, grads_seq)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(cmp_)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)


def test_bf16_moments_close_and_stored_narrow():
    """--moment_dtype bfloat16: per-step updates stay within bf16 rounding
    of the f32-moment path, moments are STORED in bf16 (the HBM saving is
    real, not a cast-on-read illusion), and frozen leaves never move."""
    rng = np.random.default_rng(12)
    params = _toy_params(rng)
    tx32 = build_optimizer(params, lr=1e-3, lr_backbone=1e-4)
    tx16 = build_optimizer(
        params, lr=1e-3, lr_backbone=1e-4, moment_dtype="bfloat16"
    )
    s32, s16 = tx32.init(params), tx16.init(params)

    moment_dtypes = {
        str(l.dtype)
        for l in jax.tree.leaves(s16)
        if hasattr(l, "dtype") and l.ndim > 0
    }
    assert "bfloat16" in moment_dtypes, f"moments not narrowed: {moment_dtypes}"

    labels = jax.tree.leaves(param_labels(params))
    p32 = p16 = params
    for i in range(4):
        grads = jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
        )
        u32, s32 = tx32.update(grads, s32, p32)
        u16, s16 = tx16.update(grads, s16, p16)
        for a, b, lab in zip(jax.tree.leaves(u32), jax.tree.leaves(u16), labels):
            a, b = np.asarray(a), np.asarray(b)
            if lab == "frozen":
                assert np.all(b == 0.0)
            else:
                # update magnitude ~lr; bf16 moment rounding perturbs the
                # adam term by ~2^-8 relative
                np.testing.assert_allclose(a, b, rtol=0.05, atol=2e-5)
        p32 = jax.tree.map(lambda p, u: p + u, p32, u32)
        p16 = jax.tree.map(lambda p, u: p + u, p16, u16)


def test_grouped_bf16_moments_close():
    rng = np.random.default_rng(13)
    params = _blocky_params(rng)
    grads_seq = [
        jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
        )
        for _ in range(3)
    ]
    ref = _run(
        build_optimizer(params, lr=1e-3, lr_backbone=1e-4, fused="grouped"),
        params, grads_seq,
    )
    grp16 = _run(
        build_optimizer(
            params, lr=1e-3, lr_backbone=1e-4, fused="grouped",
            moment_dtype="bfloat16",
        ),
        params, grads_seq,
    )
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(grp16)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=0.05, atol=1e-4)


def test_skip_nonfinite_rejects_nan_update():
    """skip_nonfinite: an inf/NaN gradient step is a no-op (params stay
    finite and unchanged); the next finite step applies normally."""
    rng = np.random.default_rng(5)
    params = _toy_params(rng)
    tx = build_optimizer(params, lr=1e-2, lr_backbone=1e-2, skip_nonfinite=10)
    state = tx.init(params)

    finite = jax.tree.map(jnp.ones_like, params)
    poisoned = jax.tree.map(jnp.ones_like, params)
    poisoned["head"]["dense"]["kernel"] = (
        poisoned["head"]["dense"]["kernel"].at[0, 0].set(jnp.nan)
    )

    upd, state = tx.update(poisoned, state, params)
    for leaf in jax.tree.leaves(upd):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)

    upd, state = tx.update(finite, state, params)
    moved = any(np.any(np.asarray(u) != 0.0) for u in jax.tree.leaves(upd))
    assert moved and all(np.all(np.isfinite(u)) for u in jax.tree.leaves(upd))
