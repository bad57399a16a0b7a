"""Training: optimizers, jitted steps, drivers, checkpointing, logging.

Replaces the reference's ``src/train/`` (train.py, train_ssd.py,
arg_parser.py) with a single jit-compiled train step per model (matcher,
criterion, and metric accumulation all inside the step — zero host syncs in
the hot loop), an epoch driver with the reference's best-checkpoint
semantics, Orbax checkpoint/resume that actually round-trips (the
reference's two resume paths are both broken — SURVEY.md §3.4), and CLI
entry points mirroring the reference flags.
"""

from .state import TrainState, create_destr_state, create_ssd_state
from .steps import (
    make_destr_eval_step,
    make_destr_train_step,
    make_ssd_eval_step,
    make_ssd_train_step,
)

__all__ = [
    "TrainState",
    "create_destr_state",
    "create_ssd_state",
    "make_destr_train_step",
    "make_destr_eval_step",
    "make_ssd_train_step",
    "make_ssd_eval_step",
]
