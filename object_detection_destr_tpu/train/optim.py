"""Optimizer construction with the reference's per-group learning rates.

The reference builds AdamW with two param groups — backbone at
``lr_backbone``, everything else at ``lr`` (train.py:240-251) — and freezes
the stem + layer1 inside the backbone module (backbone.py:92-99), with
FrozenBN buffers never trained. Here the same policy is one
``optax.multi_transform`` over param-path labels:

    "main"     -> AdamW(lr)
    "backbone" -> AdamW(lr_backbone)   (layer2/3/4 convs)
    "frozen"   -> zero update          (stem, layer1, all FrozenBN tensors)

``lr_backbone == 0`` freezes the whole backbone (arg_parser.py:20-26 note).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util
from jax.flatten_util import ravel_pytree

__all__ = [
    "build_optimizer",
    "param_labels",
    "fused_adamw",
    "grouped_adamw",
    "scale_by_adam_compact",
]

_TRAINABLE_BACKBONE_PREFIXES = ("layer2", "layer3", "layer4")


def param_labels(params: Any) -> Any:
    """Label tree: 'main' | 'backbone' | 'frozen' per parameter leaf."""
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        parts = [str(p) for p in path]
        if "backbone" in parts:
            i = parts.index("backbone")
            sub = parts[i + 1 :]
            # FrozenBN tensors (any bn*/downsample_bn scope) never train
            if any(p.startswith("bn") or p == "downsample_bn" for p in sub):
                labels[path] = "frozen"
            elif sub and any(
                sub[0].startswith(pref) for pref in _TRAINABLE_BACKBONE_PREFIXES
            ):
                labels[path] = "backbone"
            else:  # stem conv, layer1
                labels[path] = "frozen"
        else:
            labels[path] = "main"
    return traverse_util.unflatten_dict(labels)


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray  # () int32
    m: jnp.ndarray  # (P,) f32 first moment, flat
    v: jnp.ndarray  # (P,) f32 second moment, flat
    lr_vec: jnp.ndarray  # (P,) f32 per-element learning rate (0 = frozen)


def fused_adamw(
    params: Any,
    lr: float,
    lr_backbone: float,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """AdamW over ONE flat parameter vector — same math as the per-leaf
    ``multi_transform`` path (elementwise, so numerically identical), but the
    whole update compiles to a handful of large fused vector ops instead of
    ~hundreds of per-leaf fusions. The r2 profile attributed ~8 ms/step of
    the b8/640 DESTR step to the optimizer/copy tail of tiny per-leaf ops
    (BASELINE.md); the flat form replaces them with two ravels (~big
    contiguous copies) + one fused elementwise pass + one unravel.

    The per-group policy (reference train.py:240-251 + backbone.py:92-99
    freezing) is encoded as a per-element learning-rate vector built from
    :func:`param_labels` at init: 'main' -> lr, 'backbone' -> lr_backbone
    (0 disables), 'frozen' -> 0. Weight decay rides the lr like optax.adamw
    (update = -lr * (adam_term + wd * p)), so lr 0 freezes decay too.
    """
    lr_map = {
        "main": lr,
        "backbone": lr_backbone if lr_backbone > 0 else 0.0,
        "frozen": 0.0,
    }

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        labels = param_labels(params)
        lr_leaves = [
            jnp.full((leaf.size,), lr_map[lab], jnp.float32)
            for lab, leaf in zip(jax.tree.leaves(labels), jax.tree.leaves(params))
        ]
        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32),
            m=jnp.zeros_like(flat, jnp.float32),
            v=jnp.zeros_like(flat, jnp.float32),
            lr_vec=jnp.concatenate(lr_leaves),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("fused_adamw requires params (weight decay)")
        g, _ = ravel_pytree(grads)
        g = g.astype(jnp.float32)
        p, unravel = ravel_pytree(params)
        count = state.count + 1
        m = state.m * b1 + g * (1.0 - b1)
        v = state.v * b2 + g * g * (1.0 - b2)
        c = count.astype(jnp.float32)
        mhat = m / (1.0 - b1**c)
        vhat = v / (1.0 - b2**c)
        upd = -state.lr_vec * (
            mhat / (jnp.sqrt(vhat) + eps) + weight_decay * p.astype(jnp.float32)
        )
        return unravel(upd.astype(p.dtype)), FusedAdamWState(
            count=count, m=m, v=v, lr_vec=state.lr_vec
        )

    return optax.GradientTransformation(init_fn, update_fn)


class ScaleByAdamCompactState(NamedTuple):
    count: jnp.ndarray  # () int32
    mu: Any  # first moments, stored in moment_dtype
    nu: Any  # second moments, stored in moment_dtype


def scale_by_adam_compact(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype: Any = jnp.bfloat16,
) -> optax.GradientTransformation:
    """Adam scaling with BOTH moments stored in ``moment_dtype`` (read-upcast,
    f32 compute, write-round) — optax only offers ``mu_dtype``.

    Motivation is the optimizer HBM floor (BASELINE.md r5): AdamW traffic at
    f32 moments is 28 B/param (1.86 ms/step on the 54.5M-param production
    DESTR at 819 GB/s); bf16 moments cut it to 20 B/param. bf16 keeps the f32
    exponent, so there is no range cliff — the cost is mantissa rounding on
    the moment EMAs. Caveat, documented not hidden: with (1 - b2) = 1e-3
    below bf16's 2^-9 relative quantum, steady-state ``nu`` increments can
    round away (stale second moment). Round-to-nearest makes the error
    zero-mean in practice, but this is an EXPERIMENTAL opt-in
    (``--moment_dtype bfloat16``), A/B'd for step time and short-horizon
    convergence in BASELINE.md, and NOT the production-recipe default.
    """
    moment_dtype = jnp.dtype(moment_dtype)

    def init_fn(params):
        zeros = lambda t: jax.tree.map(
            lambda p: jnp.zeros(p.shape, moment_dtype), t
        )
        return ScaleByAdamCompactState(
            count=jnp.zeros((), jnp.int32), mu=zeros(params), nu=zeros(params)
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1**c
        bc2 = 1.0 - b2**c

        def one(g, m, v):
            g = g.astype(jnp.float32)
            m32 = m.astype(jnp.float32) * b1 + g * (1.0 - b1)
            v32 = v.astype(jnp.float32) * b2 + g * g * (1.0 - b2)
            out = (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            return out, m32.astype(moment_dtype), v32.astype(moment_dtype)

        # one pass per leaf producing (update, mu, nu) so XLA fuses the
        # whole read->compute->round chain; unzip through the treedef
        # (optax.masked's MaskedNode leaves flatten to nothing, so the
        # zip stays aligned under multi_transform)
        flat_u, treedef = jax.tree.flatten(updates)
        res = [
            one(g, m, v)
            for g, m, v in zip(
                flat_u, jax.tree.leaves(state.mu), jax.tree.leaves(state.nu)
            )
        ]
        return treedef.unflatten([r[0] for r in res]), ScaleByAdamCompactState(
            count=count,
            mu=treedef.unflatten([r[1] for r in res]),
            nu=treedef.unflatten([r[2] for r in res]),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def _adamw_leaf(lr, weight_decay: float, moment_dtype) -> optax.GradientTransformation:
    """optax.adamw's chain with the compact-moment scaler swapped in."""
    if moment_dtype is None:
        return optax.adamw(lr, weight_decay=weight_decay)
    return optax.chain(
        scale_by_adam_compact(moment_dtype=moment_dtype),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(lr),
    )


class GroupedAdamWState(NamedTuple):
    count: jnp.ndarray  # () int32
    m: tuple  # per shape-group stacked first moments, (n_i, *shape_i) f32
    v: tuple  # per shape-group stacked second moments


def _lr_at(spec, count):
    """Resolve an lr spec (float or optax schedule) at pre-increment count."""
    if callable(spec):
        return jnp.asarray(spec(count), jnp.float32)
    return jnp.asarray(spec, jnp.float32)


def grouped_adamw(
    params: Any,
    lr,
    lr_backbone,
    weight_decay: float = 0.01,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype: Any = None,
) -> optax.GradientTransformation:
    """AdamW over shape-grouped stacked leaves — the TPU-friendly middle
    ground between the per-leaf ``multi_transform`` (hundreds of tiny
    fusions, ~55 GB/s effective on the 2048x256 decoder leaves in the r3
    profile) and the flat :func:`fused_adamw` (a measured ~2x step
    REGRESSION: ``ravel_pytree`` relayouts every tiled leaf to linear).

    Leaves sharing ``(label, shape, dtype)`` — e.g. the six decoder blocks'
    identical weight matrices — are ``jnp.stack``-ed along a NEW major axis.
    Stacking only concatenates over the major dimension, so the minor-dims
    (8,128) tiling is preserved: no relayout, one fused elementwise update
    per group instead of per leaf, and the slices feeding
    ``optax.apply_updates`` fuse into the consumer.

    Math is identical to ``optax.adamw`` (scale_by_adam -> add_decayed_weights
    -> scale(-lr)); the per-group policy mirrors :func:`param_labels`
    ('frozen' leaves get zero updates and carry NO optimizer state, matching
    ``optax.set_to_zero``). ``lr`` / ``lr_backbone`` accept floats or optax
    schedules (evaluated at the pre-increment step count, like
    ``optax.scale_by_schedule``); ``lr_backbone == 0`` freezes the backbone
    group entirely.
    """
    bb_frozen = (not callable(lr_backbone)) and lr_backbone <= 0
    lr_specs = {"main": lr, "backbone": (0.0 if bb_frozen else lr_backbone)}
    m_dtype = jnp.dtype(moment_dtype) if moment_dtype is not None else jnp.float32

    labels = param_labels(params)
    leaves, treedef = jax.tree.flatten(params)
    lab_leaves = jax.tree.leaves(labels)
    assert len(leaves) == len(lab_leaves)
    by_key: dict = {}
    for i, (leaf, lab) in enumerate(zip(leaves, lab_leaves)):
        if lab == "frozen" or (lab == "backbone" and bb_frozen):
            continue
        key = (lab, tuple(leaf.shape), jnp.dtype(leaf.dtype).name)
        by_key.setdefault(key, []).append(i)
    group_list = [(k, tuple(by_key[k])) for k in sorted(by_key)]

    def init_fn(params):
        p_leaves = treedef.flatten_up_to(params)
        def zeros():
            # m and v must be DISTINCT buffers: the train step donates the
            # whole state, and aliased leaves trip XLA's double-donation check
            return tuple(
                jnp.zeros((len(idxs),) + p_leaves[idxs[0]].shape, m_dtype)
                for _, idxs in group_list
            )

        return GroupedAdamWState(count=jnp.zeros((), jnp.int32), m=zeros(), v=zeros())

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("grouped_adamw requires params (weight decay)")
        g_leaves = treedef.flatten_up_to(grads)
        p_leaves = treedef.flatten_up_to(params)
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1**c
        bc2 = 1.0 - b2**c
        upd_leaves = [jnp.zeros_like(p) for p in p_leaves]
        new_m, new_v = [], []
        for gi, ((lab, _, _), idxs) in enumerate(group_list):
            g = jnp.stack([g_leaves[i] for i in idxs]).astype(jnp.float32)
            p = jnp.stack([p_leaves[i] for i in idxs]).astype(jnp.float32)
            m = state.m[gi].astype(jnp.float32) * b1 + g * (1.0 - b1)
            v = state.v[gi].astype(jnp.float32) * b2 + g * g * (1.0 - b2)
            lr_t = _lr_at(lr_specs[lab], state.count)
            upd = -lr_t * ((m / bc1) / (jnp.sqrt(v / bc2) + eps) + weight_decay * p)
            upd = upd.astype(p_leaves[idxs[0]].dtype)
            for j, i in enumerate(idxs):
                upd_leaves[i] = upd[j]
            new_m.append(m.astype(m_dtype))
            new_v.append(v.astype(m_dtype))
        return treedef.unflatten(upd_leaves), GroupedAdamWState(
            count=count, m=tuple(new_m), v=tuple(new_v)
        )

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    params: Any,
    lr: float = 1e-5,
    lr_backbone: float = 1e-4,
    weight_decay: float = 0.01,  # torch AdamW default, used by train.py:240
    grad_clip: float | None = None,
    grad_accum_steps: int = 1,
    skip_nonfinite: int = 0,
    fused: bool | str = "auto",
    moment_dtype: Any = None,
) -> optax.GradientTransformation:
    """AdamW with per-group LRs; optional global-norm clip and gradient
    accumulation (``optax.MultiSteps`` — the reference has none, SURVEY.md
    §2.2 lists it as an optional wrapper for large effective batches).

    ``fused`` selects the update layout:

    - ``False`` — per-leaf ``optax.multi_transform`` (hundreds of tiny
      fusions; the r2 baseline).
    - ``"grouped"`` — :func:`grouped_adamw`: same-shaped leaves stacked
      along a new major axis (layout-preserving), one fused update per
      shape group. Schedules supported for both lr specs.
    - ``True`` — the flat single-vector :func:`fused_adamw`. MEASURED TPU
      REGRESSION (r3, b8/640 DESTR): 47.6 -> ~101.7 ms — ``ravel_pytree``
      forces a per-leaf tiled -> linear relayout. Kept parity-tested for
      future jaxlibs where flattening is layout-free; do not default to it.
    - ``"auto"`` — currently the per-leaf path (grouped flips on once its
      TPU measurement lands; see BASELINE.md r3).

    ``moment_dtype`` (None = f32) stores the Adam moments in a narrower
    dtype — see :func:`scale_by_adam_compact` for the bandwidth math and
    the nu-quantization caveat. Experimental opt-in; ignored by the flat
    layout (whose lr_vec layout already pays a relayout that dwarfs it).
    """
    if fused == "auto":
        fused = False
    if fused == "grouped":
        tx = grouped_adamw(
            params, lr, lr_backbone, weight_decay=weight_decay,
            moment_dtype=moment_dtype,
        )
    elif fused:
        if callable(lr) or callable(lr_backbone):
            raise ValueError(
                "the flat fused layout bakes lr into a static per-element "
                "vector and cannot take a schedule; use opt_layout "
                "per-leaf/grouped with lr_drop"
            )
        tx = fused_adamw(params, lr, lr_backbone, weight_decay=weight_decay)
    else:
        transforms = {
            "main": _adamw_leaf(lr, weight_decay, moment_dtype),
            "backbone": (
                _adamw_leaf(lr_backbone, weight_decay, moment_dtype)
                # optax schedules (callables) are accepted like floats
                if callable(lr_backbone) or lr_backbone > 0
                else optax.set_to_zero()
            ),
            "frozen": optax.set_to_zero(),
        }
        tx = optax.multi_transform(transforms, param_labels(params))
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if skip_nonfinite:
        # reject whole updates containing inf/NaN (params stay finite; the
        # offending step becomes a no-op). Production safety net for rare
        # degenerate batches — errors after `skip_nonfinite` consecutive
        # bad steps. The reference has no equivalent: one NaN batch
        # poisons its weights permanently.
        tx = optax.apply_if_finite(tx, max_consecutive_errors=skip_nonfinite)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
