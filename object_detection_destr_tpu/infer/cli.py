"""Batch prediction CLI — the serving surface the reference never wired
(its NMS module is an orphan ``__main__``, non_maximum_suppress.py:105-128;
SURVEY.md §3.5 calls for a real predict path covering both models).

    python -m object_detection_destr_tpu.infer.cli \
        --model destr --checkpoint_dir checkpoints --weights model_weights \
        --images img1.jpg img2.jpg --output dets.json

Loads an Orbax checkpoint, runs the batched on-device predict path, and
writes one JSON record per image: {"file", "boxes" (xyxy, normalized),
"scores", "labels"}.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DestrConfig, SSDConfig
from ..data.datasets import _load_image
from ..data.loader import _resize_canvas
from ..data.transforms import normalize_imagenet
from ..models.destr.model import build_destr
from ..models.ssd.model import build_ssd
from ..train.checkpoint import restore_for_inference
from ..train.steps import flat_anchors
from .predict import destr_predict, ssd_predict


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("object_detection_destr_tpu predict")
    p.add_argument("--model", choices=["destr", "ssd"], default="destr")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--weights", type=str, default="model_weights")
    p.add_argument("--images", nargs="+", required=True)
    p.add_argument("--output", type=str, default="detections.json")
    p.add_argument("--draw", type=str, default=None, metavar="DIR",
                   help="also write annotated PNGs (detections drawn over "
                        "the original image) into DIR")
    p.add_argument("--score_thresh", type=float, default=0.5)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--letterbox", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="aspect-preserving inference (DESTR, default since "
                        "r4): pad instead of stretch, feed the pixel "
                        "valid-mask to the model, and report boxes in "
                        "original-image coordinates; --no-letterbox restores "
                        "the square-stretch serving path")
    # model shape flags must match the checkpoint
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--ffn_dim", type=int, default=2048)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--num_encoder_blocks", type=int, default=6)
    p.add_argument("--num_decoder_blocks", type=int, default=6)
    p.add_argument("--top_k", type=int, default=300)
    p.add_argument("--num_cls", type=int, default=2)
    p.add_argument("--backbone", type=str, default="resnet50")
    p.add_argument("--dilation", action="store_true")
    return p


def main(argv=None) -> list[dict]:
    from .. import enable_persistent_jit_cache

    enable_persistent_jit_cache()
    args = get_parser().parse_args(argv)
    size = args.image_size or (640 if args.model == "destr" else 300)

    if args.model == "destr":
        cfg = DestrConfig(
            hidden_dim=args.hidden_dim,
            ffn_dim=args.ffn_dim,
            num_heads=args.num_heads,
            num_encoder_blocks=args.num_encoder_blocks,
            num_decoder_blocks=args.num_decoder_blocks,
            top_k=args.top_k,
            num_cls=args.num_cls,
            backbone=args.backbone,
            dilation=args.dilation,
        )
        model = build_destr(cfg)
    else:
        cfg = SSDConfig(num_cls=args.num_cls if args.num_cls != 2 else 20)
        model = build_ssd(cfg)

    restored = restore_for_inference(args.checkpoint_dir, args.weights)
    variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}

    if args.letterbox and args.model == "destr":
        # aspect-preserving serving: letterbox each image, run the model with
        # the pixel valid-mask, then map boxes back to original coordinates
        from ..data.loader import _letterbox_canvas
        from ..data.transforms import letterbox_infer_transform

        canvases, content = [], []
        for f in args.images:
            img, fh, fw = _letterbox_canvas(_load_image(f), size)
            canvases.append(img)
            content.append((fh, fw))
        content = np.asarray(content, np.float32)
        prep = letterbox_infer_transform(
            jnp.asarray(np.stack(canvases)), jnp.asarray(content), out_size=size
        )
        outputs, _ = model.apply(
            variables, prep["images"], valid_mask=prep["pixel_valid"], train=False
        )
        dets = destr_predict(outputs, score_thresh=args.score_thresh)
        # canvas-normalized cxcyhw -> original-image-normalized xyxy
        dets = dict(dets)
        scale = np.stack(
            [content[:, 1], content[:, 0], content[:, 1], content[:, 0]], -1
        )  # x / fw, y / fh
        dets["boxes"] = jnp.clip(dets["boxes"] / scale[:, None, :], 0.0, 1.0)
    elif args.model == "destr":
        batch = np.stack([_resize_canvas(_load_image(f), size) for f in args.images])
        images = normalize_imagenet(jnp.asarray(batch))
        outputs, _ = model.apply(variables, images, train=False)
        dets = destr_predict(outputs, score_thresh=args.score_thresh)
    else:
        batch = np.stack([_resize_canvas(_load_image(f), size) for f in args.images])
        images = normalize_imagenet(jnp.asarray(batch))
        outputs = model.apply(variables, images, train=False)
        dets = ssd_predict(outputs, flat_anchors(cfg), score_thresh=args.score_thresh)

    dets = jax.device_get(dets)
    records = []
    for i, f in enumerate(args.images):
        keep = dets["valid"][i]
        records.append(
            {
                "file": f,
                "boxes": np.asarray(dets["boxes"][i][keep]).tolist(),
                "scores": np.asarray(dets["scores"][i][keep]).tolist(),
                "labels": np.asarray(dets["labels"][i][keep]).tolist(),
            }
        )
    with open(args.output, "w") as fh:
        json.dump(records, fh)
    print(f"wrote {sum(len(r['boxes']) for r in records)} detections "
          f"for {len(records)} images -> {args.output}")
    if args.draw:
        _draw_records(records, args.draw)
    return records


def _draw_records(records: list[dict], out_dir: str) -> None:
    """Annotated PNGs: detections (normalized xyxy) over the original image."""
    import os

    from PIL import Image, ImageDraw

    os.makedirs(out_dir, exist_ok=True)
    for rec in records:
        with Image.open(rec["file"]) as im:
            im = im.convert("RGB")
            w, h = im.size
            draw = ImageDraw.Draw(im)
            for box, score, label in zip(rec["boxes"], rec["scores"], rec["labels"]):
                x1, y1, x2, y2 = box[0] * w, box[1] * h, box[2] * w, box[3] * h
                draw.rectangle([x1, y1, x2, y2], outline=(0, 255, 0), width=2)
                draw.text((x1 + 2, max(y1 - 12, 0)), f"{label}:{score:.2f}",
                          fill=(0, 255, 0))
            name = os.path.splitext(os.path.basename(rec["file"]))[0]
            im.save(os.path.join(out_dir, f"{name}_det.png"))
    print(f"wrote {len(records)} annotated images -> {out_dir}")


if __name__ == "__main__":
    main()
