"""CLI flags mirroring the reference's two argparse parsers
(src/train/arg_parser.py:14-137 DESTR, :140-220 SSD) — same names and
defaults for drop-in parity — plus the handful of knobs the TPU build adds
(dataset selection, mesh size, compute dtype)."""

from __future__ import annotations

import argparse

from ..config import Config, DataConfig, DestrConfig, SSDConfig, TrainConfig

__all__ = ["get_parser", "config_from_args"]


def _common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--lr_backbone", type=float, default=1e-4)
    p.add_argument("--lr_drop", type=int, default=0,
                   help="epoch at which both lrs multiply by "
                        "--lr_drop_factor (0 = constant lr, the reference "
                        "behavior — its trainer has no schedule). NOTE: "
                        "--resume requires the same lr_drop setting the "
                        "checkpoint was written with (the schedule lives "
                        "in the optimizer state tree)")
    p.add_argument("--lr_drop_factor", type=float, default=0.1)
    p.add_argument("--lr_warmup_steps", type=int, default=0,
                   help="linear lr warmup over the first N steps (0 = off, "
                        "the reference behavior; from-scratch production "
                        "training diverges without it, BASELINE.md r4)")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--augment_factor", type=int, default=5)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--resume_from", type=str, default="model_weights")
    p.add_argument("--save_as", type=str, default="model_weights")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--log_dir", type=str, default="runs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of early steps here")
    p.add_argument("--coco_eval", action="store_true",
                   help="also compute COCO-style AP at validation")
    p.add_argument("--grad_accum_steps", type=int, default=1)
    p.add_argument("--grad_clip_norm", type=float, default=0.0,
                   help="global-norm gradient clip before AdamW (0 = off, "
                        "the reference behavior; DETR-family trainers use "
                        "0.1 — load-bearing with --class_norm boxes)")
    p.add_argument("--skip_nonfinite", type=int, default=0,
                   help="reject optimizer updates containing inf/NaN "
                        "(optax.apply_if_finite); value = max consecutive "
                        "rejections before erroring, 0 = off")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="per-step parameter EMA decay (0 = off, the "
                        "reference behavior). Adds an EMA validation sweep "
                        "per epoch and a {save_as}_ema best checkpoint; "
                        "does not affect the training trajectory")
    p.add_argument("--opt_layout", type=str, default="auto",
                   choices=["auto", "per-leaf", "grouped", "flat"],
                   help="AdamW update layout (train/optim.py): grouped "
                        "stacks same-shaped leaves into one fused update "
                        "per shape group")
    p.add_argument("--moment_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="Adam moment storage dtype; bfloat16 cuts optimizer "
                        "HBM traffic 28 -> 20 B/param (experimental — "
                        "train/optim.py::scale_by_adam_compact)")
    p.add_argument("--rng_impl", type=str, default="rbg",
                   choices=["rbg", "threefry"],
                   help="dropout-stream PRNG: rbg = TPU-native bit "
                        "generator (default), threefry = JAX default")
    # the reference's --device selects cuda/cpu (arg_parser.py:85-89);
    # here devices come from the mesh — the flag is accepted and ignored
    p.add_argument("--device", type=str, default="tpu")
    # TPU-build additions
    p.add_argument("--dataset", type=str, default="synthetic",
                   choices=["synthetic", "widerface", "voc", "coco"])
    p.add_argument("--data_root", type=str, default="dataset")
    p.add_argument("--num_train_samples", type=int, default=64)
    p.add_argument("--num_valid_samples", type=int, default=16)
    p.add_argument("--synthetic_size", type=int, default=256,
                   help="generation resolution of the synthetic dataset "
                        "(shorter side, px). The loader still resizes to "
                        "the canvas; raise to ~the canvas size so "
                        "production-scale runs train on full-resolution "
                        "content instead of upscaled 256px scenes")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--device_cache", action="store_true",
                   help="decode the dataset once and serve batches from "
                        "device HBM (uint8 canvases, ~1.35 MB per 672px "
                        "image); removes the per-step host feed for sets "
                        "that fit memory")
    p.add_argument("--epoch_scan", action="store_true",
                   help="compile each training epoch into ONE lax.scan "
                        "program (requires --device_cache): one dispatch "
                        "per epoch instead of per step; identical math, "
                        "see train/epoch_scan.py")
    p.add_argument("--val_interval", type=int, default=1,
                   help="run the validation sweep every N epochs "
                        "(1 = reference behavior; the final epoch always "
                        "validates)")
    p.add_argument("--save_interval", type=int, default=1,
                   help="save the `_last` crash-recovery checkpoint every "
                        "N epochs (validated epochs always save); on a "
                        "relay-attached chip each save fetches the full "
                        "train state through the tunnel")


def get_parser(model_name: str = "destr") -> argparse.ArgumentParser:
    """Parser factory keyed by model name (arg_parser.py:4-11)."""
    p = argparse.ArgumentParser(f"object_detection_destr_tpu {model_name} training")
    _common(p)
    if model_name == "destr":
        p.add_argument("--set_cost_class", type=float, default=0.5)
        p.add_argument("--set_cost_bbox", type=float, default=0.0)
        p.add_argument("--set_cost_ciou", type=float, default=0.5)
        p.add_argument("--class_norm", type=str, default="queries",
                       choices=["queries", "boxes"],
                       help="focal-loss normalizer: 'queries' divides the "
                            "per-image focal sum by the prediction-row count "
                            "(reference-faithful, criterion.py:40-49); "
                            "'boxes' divides by the GT count (DETR-family). "
                            "At top_k=300 'queries' starves the positive "
                            "class gradient ~67x (BASELINE.md r4)")
        p.add_argument("--num_encoder_blocks", type=int, default=6)
        p.add_argument("--num_decoder_blocks", type=int, default=6)
        p.add_argument("--top_k", type=int, default=300)
        p.add_argument("--num_cls", type=int, default=2)
        p.add_argument("--hidden_dim", type=int, default=256)
        p.add_argument("--ffn_dim", type=int, default=2048)
        p.add_argument("--num_heads", type=int, default=8)
        p.add_argument("--backbone", type=str, default="resnet50",
                       choices=["resnet50", "resnet101"])
        p.add_argument("--dilation", action="store_true")
        p.add_argument("--image_size", type=int, default=640)
        p.add_argument("--letterbox", action="store_true",
                       help="aspect-preserving data path for TRAINING too: "
                            "pad instead of stretch, pixel valid-mask into "
                            "the model (eval is aspect-preserving by default "
                            "already, see --letterbox_eval)")
        p.add_argument("--letterbox_eval", action=argparse.BooleanOptionalAction,
                       default=True,
                       help="DESTR validation uses the reference's "
                            "aspect-preserving Resize(672)+CenterCrop(640) "
                            "geometry (src/dataset/transforms.py:170-181). "
                            "--no-letterbox_eval restores the square-stretch "
                            "eval the pre-r4 benches were recorded under")
        p.add_argument("--use_flash_attention", type=str, default="auto",
                       choices=["auto", "on", "off"],
                       help="fused Pallas attention (encoder MHSA + decoder "
                            "cross attention), incl. in-kernel attention "
                            "dropout; auto = on for TPU, off elsewhere")
    elif model_name == "ssd":
        p.add_argument("--coef_class_loss", type=float, default=0.5)
        p.add_argument("--num_cls", type=int, default=20)
        p.add_argument("--scale_min", type=float, default=0.2)
        p.add_argument("--scale_max", type=float, default=0.9)
        p.add_argument("--image_size", type=int, default=300)
        p.add_argument("--hard_neg_mining", type=str, default="reference",
                       choices=["reference", "paper"],
                       help="negative mining direction: 'reference' keeps the "
                            "easiest negatives (the reference's inverted sort, "
                            "criterion.py:329-332); 'paper' keeps the "
                            "highest-loss negatives (SSD-paper semantics)")
    else:
        raise ValueError(f"unknown model {model_name!r}")
    return p


def config_from_args(args: argparse.Namespace, model_name: str) -> Config:
    train = TrainConfig(
        lr=args.lr,
        lr_backbone=args.lr_backbone,
        lr_drop=args.lr_drop,
        lr_drop_factor=args.lr_drop_factor,
        lr_warmup_steps=getattr(args, "lr_warmup_steps", 0),
        epochs=args.epochs,
        batch_size=args.batch_size,
        set_cost_class=getattr(args, "set_cost_class", 0.5),
        set_cost_bbox=getattr(args, "set_cost_bbox", 0.0),
        set_cost_ciou=getattr(args, "set_cost_ciou", 0.5),
        class_norm=getattr(args, "class_norm", "queries"),
        coef_class_loss=getattr(args, "coef_class_loss", 0.5),
        augment_factor=args.augment_factor,
        resume=args.resume,
        resume_from=args.resume_from,
        save_as=args.save_as,
        checkpoint_dir=args.checkpoint_dir,
        log_dir=args.log_dir,
        seed=args.seed,
        log_interval=args.log_interval,
        profile_dir=args.profile_dir,
        coco_eval=args.coco_eval,
        grad_accum_steps=args.grad_accum_steps,
        grad_clip_norm=getattr(args, "grad_clip_norm", 0.0),
        skip_nonfinite_updates=getattr(args, "skip_nonfinite", 0),
        ema_decay=getattr(args, "ema_decay", 0.0),
        opt_layout=getattr(args, "opt_layout", "auto"),
        moment_dtype=getattr(args, "moment_dtype", "float32"),
        epoch_scan=getattr(args, "epoch_scan", False),
        val_interval=getattr(args, "val_interval", 1),
        save_interval=getattr(args, "save_interval", 1),
        rng_impl=getattr(args, "rng_impl", "rbg"),
        image_size=getattr(args, "image_size", 640),
        letterbox=getattr(args, "letterbox", False),
        letterbox_eval=getattr(args, "letterbox_eval", True),
    )
    destr = DestrConfig(
        hidden_dim=getattr(args, "hidden_dim", 256),
        ffn_dim=getattr(args, "ffn_dim", 2048),
        num_heads=getattr(args, "num_heads", 8),
        num_encoder_blocks=getattr(args, "num_encoder_blocks", 6),
        num_decoder_blocks=getattr(args, "num_decoder_blocks", 6),
        top_k=getattr(args, "top_k", 300),
        num_cls=getattr(args, "num_cls", 2) if model_name == "destr" else 2,
        backbone=getattr(args, "backbone", "resnet50"),
        dilation=getattr(args, "dilation", False),
        use_flash_attention={"on": True, "off": False}.get(
            getattr(args, "use_flash_attention", "auto"), "auto"
        ),
        compute_dtype=args.compute_dtype,
    )
    ssd = SSDConfig(
        num_cls=getattr(args, "num_cls", 20) if model_name == "ssd" else 20,
        scale_min=getattr(args, "scale_min", 0.2),
        scale_max=getattr(args, "scale_max", 0.9),
        image_size=getattr(args, "image_size", 300) if model_name == "ssd" else 300,
        compute_dtype=args.compute_dtype,
        hard_neg_mining=getattr(args, "hard_neg_mining", "reference"),
    )
    data = DataConfig(
        dataset=args.dataset,
        root=args.data_root,
        image_size=(
            getattr(args, "synthetic_size", 256)
            if args.dataset == "synthetic"
            else 640
        ),
        max_targets=300,
        augment_factor=args.augment_factor,
        num_train_samples=args.num_train_samples,
        num_valid_samples=args.num_valid_samples,
        device_cache=getattr(args, "device_cache", False),
    )
    return Config(destr=destr, ssd=ssd, train=train, data=data)
