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

from typing import Any

import optax
from flax import traverse_util

__all__ = ["build_optimizer", "param_labels"]

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


def build_optimizer(
    params: Any,
    lr: float = 1e-5,
    lr_backbone: float = 1e-4,
    weight_decay: float = 0.01,  # torch AdamW default, used by train.py:240
    grad_clip: float | None = None,
    grad_accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW with per-group LRs; optional global-norm clip and gradient
    accumulation (``optax.MultiSteps`` — the reference has none, SURVEY.md
    §2.2 lists it as an optional wrapper for large effective batches)."""
    transforms = {
        "main": optax.adamw(lr, weight_decay=weight_decay),
        "backbone": (
            optax.adamw(lr_backbone, weight_decay=weight_decay)
            if lr_backbone > 0
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
