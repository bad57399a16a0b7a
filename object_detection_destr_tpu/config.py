"""Configuration tree for models, data, and training.

One dataclass hierarchy replaces the reference's two argparse parsers
(arg_parser.py:14-137, 140-220); the CLI drivers in ``train/`` expose flags
with the reference's names and defaults for parity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence


@dataclasses.dataclass(frozen=True)
class DestrConfig:
    """DESTR split-transformer config (reference defaults: arg_parser.py:14-137)."""

    hidden_dim: int = 256
    num_heads: int = 8
    num_encoder_blocks: int = 6
    num_decoder_blocks: int = 6
    top_k: int = 300
    num_cls: int = 2
    dropout: float = 0.3
    ffn_dim: int = 2048  # encoder FFN width (encoder_block.py:64)
    lambda_pair: float = 0.5  # self/pair attention blend (decoder_block.py:73)
    backbone: str = "resnet50"
    dilation: bool = False  # replace C5 stride with dilation (backbone.py:139-143)
    # image-plane positional encoding: "sine" (the wired reference default,
    # position_encoding_cdetr.py:144-150) or "learned" (its :93-127 variant)
    pos_embed: str = "sine"
    # "reference": softmax before /sqrt(2d) as in pair_self_attention.py:98;
    # "paper": scale logits before softmax (DESTR paper form)
    pair_mode: str = "reference"
    # pair-attention output half selection; "reference" reproduces the
    # flatten-order quirk of pair_self_attention.py:99-105 (see REFCOMPAT.md)
    pair_output_mode: str = "reference"
    compute_dtype: str = "float32"  # "bfloat16" for MXU-friendly training
    # rematerialize encoder/decoder blocks in the backward pass — trades
    # FLOPs for activation memory (useful at 1333px / large batch)
    remat: bool = False
    # fused Pallas flash attention for encoder MHSA + decoder cross-attn
    # (no (S, S) logits in HBM). "auto" (default) enables it on TPU and
    # disables it elsewhere (CPU interpret mode is test-only and slow);
    # measured -8% device step time at 640px/b8 and +14% at 7056 tokens
    # (BASELINE.md). True/False force it.
    use_flash_attention: bool | str = "auto"
    # set to the mesh data-axis name (e.g. "data") when the train step runs
    # under shard_map: mini-detector BatchNorms then compute GLOBAL batch
    # statistics via lax.pmean (flax axis_name), keeping multi-device train
    # math identical to single-device. Must stay None outside shard_map
    # (the axis would be unbound).
    bn_axis_name: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class SSDConfig:
    """SSD config (reference defaults: arg_parser.py:140-220, model_ssd.py:6-21)."""

    num_cls: int = 20
    scale_min: float = 0.2
    scale_max: float = 0.9
    image_size: int = 300
    # per-scale anchors and grids (model_ssd.py:11; matcher.py:214 uses 37)
    anchors_per_scale: Sequence[int] = (4, 6, 6, 6, 4, 4)
    feature_shapes: Sequence[int] = (37, 19, 10, 5, 3, 1)
    aspect_ratios: Sequence[Sequence[int]] = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,))
    compute_dtype: str = "float32"
    # hard-negative mining direction (REFCOMPAT configurable quirk #5): "reference" keeps the
    # highest-background-confidence (easiest) negatives, reproducing the
    # reference's inverted sort (criterion.py:329-332); "paper" keeps the
    # highest-loss negatives (SSD-paper semantics)
    hard_neg_mining: str = "reference"
    # see DestrConfig.bn_axis_name — same contract for the SSD BatchNorms
    bn_axis_name: Optional[str] = None

    @property
    def scales(self) -> list[float]:
        """7 scales: arange(min, max+step, step) with step=(max-min)/5
        (matcher.py:203-210)."""
        step = (self.scale_max - self.scale_min) / 5
        return [self.scale_min + i * step for i in range(7)]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training config (reference defaults: arg_parser.py:14-96)."""

    lr: float = 1e-5
    lr_backbone: float = 1e-4  # 0 freezes the backbone entirely
    # epoch index at which BOTH lrs multiply by lr_drop_factor (0 = off).
    # The reference trainer has no schedule (src/train/train.py:240-251);
    # this is a documented shared extension (VERDICT r3 #5) — the 60-epoch
    # A/B showed the constant reference lr destabilizes long runs on both
    # sides. Applied as an optax piecewise-constant schedule on the step
    # count, so it survives checkpoint resume (the count lives in opt_state).
    lr_drop: int = 0
    lr_drop_factor: float = 0.1
    epochs: int = 10
    batch_size: int = 12
    set_cost_class: float = 0.5
    set_cost_bbox: float = 0.0
    set_cost_ciou: float = 0.5
    # DESTR focal-loss normalizer: "queries" = reference-faithful (the focal
    # sum divides by the prediction-row count, criterion.py:40-49), "boxes" =
    # DETR-family normalization by the per-image GT count. At top_k=300 the
    # reference normalization dilutes the positive-class gradient ~67x and
    # the model never becomes argmax-confident on objects (r4 production run,
    # BASELINE.md); "boxes" is the documented shared extension that fixes it
    # (REFCOMPAT "class-loss normalization").
    class_norm: str = "queries"
    # optax.clip_by_global_norm before AdamW; 0 disables (the reference has
    # no clipping — DETR-family trainers clip at max-norm 0.1, and the r4
    # production runs showed the boxes-normalized class loss needs it)
    grad_clip_norm: float = 0.0
    # reject optimizer updates containing inf/NaN (optax.apply_if_finite);
    # value = max consecutive rejected steps before erroring; 0 disables.
    # Also gates the BN batch_stats update elementwise on finiteness —
    # running stats poisoned by one NaN forward otherwise never recover.
    skip_nonfinite_updates: int = 0
    # linear lr warmup over the first N steps (0 = off, reference behavior).
    # From-scratch DESTR at production scale diverges without it
    # (BASELINE.md r4 runs 3a/3c)
    lr_warmup_steps: int = 0
    # exponential moving average of the params (0 = off, the reference
    # behavior). When set, the drivers keep a per-step EMA copy (decay d:
    # ema = d*ema + (1-d)*params), run a SECOND validation sweep on the EMA
    # weights each epoch (tags Loss/valid_ema/*, Metric/ema_mAP), and save
    # the best-EMA-val checkpoint as {save_as}_ema. The training trajectory
    # is untouched — EMA reads params, never writes them. Motivation: the
    # reference 11-point metric responds discontinuously to small logit
    # shifts between adjacent epochs (BASELINE.md r5 val-noise study); EMA
    # weights average that movement out.
    ema_decay: float = 0.0
    # one-dispatch epochs (train/epoch_scan.py): with device_cache, compile
    # gather -> augment -> train_step -> EMA for the WHOLE epoch into a
    # single lax.scan program — one host->device dispatch per epoch instead
    # of one per step. Single-device it replays the per-step path's batch
    # order, augmentation key stream, and step math exactly; it exists
    # because on a tunneled/pooled chip the per-step dispatch RTT (~0.3-1 s)
    # dwarfs the device step (~25 ms). Requires device_cache; ignored (with
    # a warning) without it.
    epoch_scan: bool = False
    # run the validation sweep every N epochs (1 = reference behavior,
    # train.py:59-119). The final epoch always validates; best-checkpoint
    # selection sees only validated epochs. Long production runs on a
    # relay-attached chip spend more wall time in the per-batch val sweep
    # than in scanned training epochs — N>1 rebalances that.
    val_interval: int = 1
    # Save the crash-recovery `_last` checkpoint every N epochs (validated
    # epochs always save). 1 = every epoch (reference-equivalent safety);
    # on a relay-attached chip each save fetches the full train state
    # (~hundreds of MB) through the tunnel, so N>1 trades recovery
    # granularity for epoch wall time the same way val_interval does.
    save_interval: int = 1
    coef_class_loss: float = 0.5  # SSD class/local blend
    grad_accum_steps: int = 1  # optax.MultiSteps; 1 = off
    # AdamW update layout: "auto" | "per-leaf" | "grouped" | "flat"
    # (train/optim.py::build_optimizer — grouped stacks same-shaped leaves)
    opt_layout: str = "auto"
    # Adam moment storage dtype: "float32" (default) | "bfloat16".
    # bf16 cuts optimizer HBM traffic 28 -> 20 B/param (the r5 floor
    # analysis' named lever); EXPERIMENTAL — see
    # train/optim.py::scale_by_adam_compact for the nu-rounding caveat.
    moment_dtype: str = "float32"
    augment_factor: int = 5
    resume: bool = False
    resume_from: str = "model_weights"
    save_as: str = "model_weights"
    checkpoint_dir: str = "checkpoints"
    log_dir: str = "runs"
    log_interval: int = 100
    seed: int = 0
    # jax.profiler trace of a few early steps lands here (train/profiler.py)
    profile_dir: Optional[str] = None
    # also compute COCO-style AP (101-point, IoU 0.5:0.95) at validation —
    # the BASELINE.json north-star metric; the reference metric stays on
    coco_eval: bool = False
    # model-loss / mini-detector-loss blend (train.py:172-175)
    model_loss_weight: float = 0.7
    det_loss_weight: float = 0.3
    # data
    image_size: int = 640
    max_targets: int = 300  # dataset.py:54 caps GT boxes at 300
    # aspect-preserving letterbox data path (vs the default square stretch):
    # the loader pads instead of stretching, train crops carry a pixel
    # validity mask into the model, and eval reproduces the reference's
    # shorter-side-672 + center-crop-640 geometry exactly
    # (src/dataset/transforms.py:170-181)
    letterbox: bool = False
    # DESTR VALIDATION geometry alone (r4 default flip, REFCOMPAT "letterbox
    # eval geometry"): the val loader letterboxes and the eval transform
    # computes the reference's aspect-preserving Resize(672)+CenterCrop(640)
    # window over the preserved content — eval numbers are geometry-comparable
    # to the reference by default. The TRAIN path keeps the square-stretch
    # default (reference training distorts aspect via RandomResizedCrop
    # anyway, src/dataset/transforms.py:160-169); `letterbox=True` still
    # switches the full data path including training. False restores the
    # pre-r4 square-stretch eval.
    letterbox_eval: bool = True
    # PRNG impl for the training-time dropout stream (train/state.py). "rbg"
    # lowers jax.random draws to the TPU-native RngBitGenerator — the default
    # threefry's 20-round xor chains are recomputed inside the step's hot
    # dropout fusions and showed up as measurable VPU time in the b8/640
    # profile (BASELINE.md r3). Param init stays threefry regardless, so
    # initialization (and every converted-checkpoint parity test) is
    # unaffected; dropout is a statistical op, so the draw stream is free to
    # differ. "threefry" restores the JAX default stream.
    rng_impl: str = "rbg"
    # parallelism
    num_data_shards: int = 1  # devices on the 'data' mesh axis


@dataclasses.dataclass(frozen=True)
class DataConfig:
    dataset: str = "synthetic"  # synthetic | widerface | voc | coco
    root: str = "dataset"
    image_size: int = 640
    max_targets: int = 300
    augment_factor: int = 5
    num_train_samples: int = 64  # synthetic only
    num_valid_samples: int = 16  # synthetic only
    # decode the whole dataset once and serve batches from device HBM
    # (data/device_cache.py): removes the per-step host feed for sets that
    # fit memory (~1.35 MB per 672px canvas -> a few thousand images per
    # chip). The step's host->device traffic drops to one index vector.
    device_cache: bool = False


@dataclasses.dataclass(frozen=True)
class Config:
    destr: DestrConfig = dataclasses.field(default_factory=DestrConfig)
    ssd: SSDConfig = dataclasses.field(default_factory=SSDConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
