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

__all__ = ["build_optimizer", "param_labels", "fused_adamw"]

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


def build_optimizer(
    params: Any,
    lr: float = 1e-5,
    lr_backbone: float = 1e-4,
    weight_decay: float = 0.01,  # torch AdamW default, used by train.py:240
    grad_clip: float | None = None,
    grad_accum_steps: int = 1,
    fused: bool | str = "auto",
) -> optax.GradientTransformation:
    """AdamW with per-group LRs; optional global-norm clip and gradient
    accumulation (``optax.MultiSteps`` — the reference has none, SURVEY.md
    §2.2 lists it as an optional wrapper for large effective batches).

    ``fused=True`` selects the flat single-fusion AdamW (:func:`fused_adamw`,
    same math). MEASURED TPU REGRESSION (r3, b8/640 DESTR): the flat form
    took the step 47.6 -> ~101.7 ms — ravel/unravel forces a per-leaf tiled
    -> linear relayout (two ~22/11 ms reshape ops + concatenates in the
    profile), far exceeding the ~8 ms per-leaf tail it was meant to remove.
    ``"auto"`` therefore resolves to the per-leaf path everywhere; the fused
    form stays available (and parity-tested) for future jaxlibs where
    flattening is layout-free.
    """
    if fused == "auto":
        fused = False
    if fused:
        tx = fused_adamw(params, lr, lr_backbone, weight_decay=weight_decay)
    else:
        transforms = {
            "main": optax.adamw(lr, weight_decay=weight_decay),
            "backbone": (
                optax.adamw(lr_backbone, weight_decay=weight_decay)
                # optax schedules (callables) are accepted like floats
                if callable(lr_backbone) or lr_backbone > 0
                else optax.set_to_zero()
            ),
            "frozen": optax.set_to_zero(),
        }
        tx = optax.multi_transform(transforms, param_labels(params))
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_steps)
    return tx
