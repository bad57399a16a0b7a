"""Train state: one pytree holding params, BN stats, optimizer state, step,
and PRNG key — the unit that the jitted step donates and Orbax checkpoints
atomically (vs the reference's raw ``model.state_dict()`` saves that can't
round-trip through either of its resume paths, SURVEY.md §3.4)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import TrainConfig
from ..models.destr.model import DESTR
from ..models.ssd.model import SSD
from .optim import build_optimizer

__all__ = ["TrainState", "create_destr_state", "create_ssd_state"]


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array

    def apply_gradients(self, grads: Any, tx: optax.GradientTransformation, **updates):
        upd, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, upd)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            **updates,
        )


def _lr_specs(train_cfg: TrainConfig, steps_per_epoch: int):
    """(lr, lr_backbone) as floats, or optax schedules when ``lr_drop``
    and/or ``lr_warmup_steps`` are set (shared extensions; the reference has
    no schedule). Boundaries are STEP counts so both survive checkpoint
    resume via the optimizer count."""
    lr, lr_bb = train_cfg.lr, train_cfg.lr_backbone
    drop = getattr(train_cfg, "lr_drop", 0)
    warmup = getattr(train_cfg, "lr_warmup_steps", 0)
    boundary_step = (
        drop * steps_per_epoch if drop and drop > 0 and steps_per_epoch > 0 else 0
    )
    factor = getattr(train_cfg, "lr_drop_factor", 0.1)

    def make(base):
        if not (warmup or boundary_step):
            return base

        def sched(count):
            value = base
            if boundary_step:
                value = value * jnp.where(count >= boundary_step, factor, 1.0)
            if warmup:
                value = value * jnp.minimum(1.0, (count + 1) / warmup)
            return value

        return sched

    lr = make(lr)
    if lr_bb > 0:
        lr_bb = make(lr_bb)
    return lr, lr_bb


def _init_state(
    model,
    dummy_images,
    train_cfg: TrainConfig,
    seed_shift: int = 0,
    steps_per_epoch: int = 0,
):
    rng = jax.random.key(train_cfg.seed + seed_shift)
    init_rng, state_rng = jax.random.split(rng)
    impl = getattr(train_cfg, "rng_impl", "rbg")
    if impl != "threefry":
        # dropout stream on the cheap TPU-native generator (config.rng_impl);
        # init_rng stays threefry so param init is bit-stable across configs
        state_rng = jax.random.key(train_cfg.seed + seed_shift, impl=impl)
    variables = model.init(
        {"params": init_rng, "dropout": init_rng}, dummy_images, train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    lr, lr_backbone = _lr_specs(train_cfg, steps_per_epoch)
    tx = build_optimizer(
        params,
        lr=lr,
        lr_backbone=lr_backbone,
        grad_clip=getattr(train_cfg, "grad_clip_norm", 0.0) or None,
        skip_nonfinite=getattr(train_cfg, "skip_nonfinite_updates", 0),
        grad_accum_steps=train_cfg.grad_accum_steps,
        fused={"per-leaf": False, "grouped": "grouped", "flat": True}.get(
            getattr(train_cfg, "opt_layout", "auto"), "auto"
        ),
        moment_dtype=(
            None
            if getattr(train_cfg, "moment_dtype", "float32") == "float32"
            else getattr(train_cfg, "moment_dtype")
        ),
    )
    return (
        TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            rng=state_rng,
        ),
        tx,
    )


def create_destr_state(
    model: DESTR,
    train_cfg: TrainConfig,
    image_size: int | None = None,
    steps_per_epoch: int = 0,
):
    size = image_size or train_cfg.image_size
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    return _init_state(model, dummy, train_cfg, steps_per_epoch=steps_per_epoch)


def create_ssd_state(
    model: SSD,
    train_cfg: TrainConfig,
    image_size: int = 300,
    steps_per_epoch: int = 0,
):
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    return _init_state(model, dummy, train_cfg, steps_per_epoch=steps_per_epoch)
