"""Import torch backbone checkpoints into an Orbax train checkpoint.

Completes the pretrained-weights story (SURVEY.md §7 hard part 5): the
reference gets ImageNet weights implicitly from torchvision
(backbone.py:139, model_ssd.py:141); in the zero-egress TPU environment the
user exports them once on any torch machine::

    import torch, torchvision, numpy as np
    sd = torchvision.models.resnet50(weights="IMAGENET1K_V1").state_dict()
    np.savez("resnet50.npz", **{k: v.numpy() for k, v in sd.items()})

and imports here::

    python -m object_detection_destr_tpu.models.import_weights \
        --model destr --weights resnet50.npz \
        --checkpoint_dir checkpoints --save_as pretrained

which writes a full train checkpoint whose backbone carries the torch
weights and whose remaining parameters are freshly initialized — ready for
``--resume --resume_from pretrained``.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..config import DestrConfig, SSDConfig, TrainConfig
from ..train.checkpoint import save_checkpoint
from .convert import resnet_params_from_torch, vgg16_params_from_torch


def _load_state_dict(path: str) -> dict:
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("object_detection_destr_tpu import_weights")
    p.add_argument("--model", choices=["destr", "ssd"], default="destr")
    p.add_argument("--weights", required=True, help=".npz or torch .pth state dict")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--save_as", type=str, default="pretrained")
    p.add_argument("--backbone", type=str, default="resnet50",
                   choices=["resnet50", "resnet101"])
    p.add_argument("--image_size", type=int, default=None)
    # model-shape flags (must match the later train run so the checkpoint's
    # state template lines up at --resume time); defaults mirror the train CLI
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--ffn_dim", type=int, default=2048)
    p.add_argument("--num_encoder_blocks", type=int, default=6)
    p.add_argument("--num_decoder_blocks", type=int, default=6)
    p.add_argument("--top_k", type=int, default=300)
    p.add_argument("--num_cls", type=int, default=None,
                   help="defaults: 2 for destr, 20 for ssd")
    p.add_argument("--dilation", action="store_true")
    # lr_backbone==0 vs >0 changes the optimizer-state structure
    # (train/optim.py builds set_to_zero vs adamw for the backbone group)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--lr_backbone", type=float, default=1e-4)
    return p


def main(argv=None) -> str:
    from .destr.model import build_destr
    from .ssd.model import build_ssd
    from ..train.state import create_destr_state, create_ssd_state

    args = get_parser().parse_args(argv)
    sd = _load_state_dict(args.weights)
    train_cfg = TrainConfig(lr=args.lr, lr_backbone=args.lr_backbone)

    if args.model == "destr":
        cfg = DestrConfig(
            backbone=args.backbone,
            dilation=args.dilation,
            hidden_dim=args.hidden_dim,
            num_heads=args.num_heads,
            ffn_dim=args.ffn_dim,
            num_encoder_blocks=args.num_encoder_blocks,
            num_decoder_blocks=args.num_decoder_blocks,
            top_k=args.top_k,
            num_cls=args.num_cls or 2,
        )
        model = build_destr(cfg)
        state, _ = create_destr_state(
            model, train_cfg, image_size=args.image_size or 640
        )
        stage_sizes = (3, 4, 6, 3) if args.backbone == "resnet50" else (3, 4, 23, 3)
        backbone = resnet_params_from_torch(sd, stage_sizes)
    else:
        cfg = SSDConfig(num_cls=args.num_cls or 20)
        model = build_ssd(cfg)
        state, _ = create_ssd_state(
            model, train_cfg, image_size=args.image_size or cfg.image_size
        )
        backbone = vgg16_params_from_torch(sd)

    params = dict(state.params)
    params["backbone"] = backbone
    state = state.replace(params=params)
    path = save_checkpoint(args.checkpoint_dir, args.save_as, state, {"epoch": 0, "step": 0})
    print(f"imported {args.model} backbone weights -> {path}")
    return path


if __name__ == "__main__":
    main()
