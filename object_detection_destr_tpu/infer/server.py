"""Minimal HTTP serving for batched detection.

    python -m object_detection_destr_tpu.infer.server \
        --model destr --checkpoint_dir checkpoints --weights model_weights \
        --port 8900

Protocol (stdlib-only, no framework dependency):
    POST /predict   body = raw JPEG/PNG bytes (or JSON {"image_b64": ...})
    -> {"boxes": [[x1,y1,x2,y2], ...] (normalized), "scores": [...],
        "labels": [...]}
    GET /healthz    -> {"ok": true}

The model is compiled once at startup for a fixed input size; DESTR requests
are letterboxed (aspect-preserving + pixel valid-mask, boxes mapped back to
original coordinates) onto that canvas, SSD requests stretched like its
reference eval (transforms.py:141-152). This is the
real serving path the reference never had (its NMS module is an orphan
``__main__`` — SURVEY.md §3.5).
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DestrConfig, SSDConfig
from ..data.loader import _resize_canvas
from ..data.transforms import normalize_imagenet
from ..models.destr.model import build_destr
from ..models.ssd.model import build_ssd
from ..train.checkpoint import restore_for_inference
from ..train.steps import flat_anchors
from .predict import destr_predict, ssd_predict

__all__ = ["DetectionService", "serve", "get_parser"]


class DetectionService:
    """Compiled predict function + host preprocessing, thread-safe.

    DESTR serving is aspect-preserving by default (r4, REFCOMPAT "letterbox
    eval geometry"): the image letterboxes onto the canvas, the model runs
    with the pixel valid-mask, and boxes map back to original-image
    coordinates. ``letterbox=False`` restores the square stretch (always the
    case for SSD — its reference stretches, transforms.py:141-152).
    """

    def __init__(self, model_kind, model, variables, image_size, score_thresh,
                 anchors=None, letterbox=True):
        self.model_kind = model_kind
        self.image_size = image_size
        self.score_thresh = score_thresh
        self.letterbox = letterbox and model_kind == "destr"
        self._lock = threading.Lock()

        if self.letterbox:

            @jax.jit
            def predict(images, pixel_valid):
                outputs, _ = model.apply(
                    variables, images, valid_mask=pixel_valid, train=False
                )
                return destr_predict(outputs, score_thresh=score_thresh)

            self._predict = predict
            self._predict(
                jnp.zeros((1, image_size, image_size, 3), jnp.float32),
                jnp.ones((1, image_size, image_size), bool),
            )
            return
        if model_kind == "destr":

            @jax.jit
            def predict(images):
                outputs, _ = model.apply(variables, images, train=False)
                return destr_predict(outputs, score_thresh=score_thresh)
        else:

            @jax.jit
            def predict(images):
                outputs = model.apply(variables, images, train=False)
                return ssd_predict(outputs, anchors, score_thresh=score_thresh)

        self._predict = predict
        # compile eagerly so the first request is fast
        self._predict(jnp.zeros((1, image_size, image_size, 3), jnp.float32))

    def predict_image(self, image_uint8: np.ndarray) -> dict:
        if self.letterbox:
            from ..data.loader import _letterbox_canvas
            from ..data.transforms import letterbox_infer_transform

            canvas, fh, fw = _letterbox_canvas(image_uint8, self.image_size)
            prep = letterbox_infer_transform(
                jnp.asarray(canvas[None]),
                jnp.asarray([[fh, fw]], jnp.float32),
                out_size=self.image_size,
            )
            with self._lock:
                dets = jax.device_get(
                    self._predict(prep["images"], prep["pixel_valid"])
                )
            keep = dets["valid"][0]
            # canvas-normalized xyxy -> original-image-normalized
            scale = np.asarray([fw, fh, fw, fh], np.float32)
            boxes = np.clip(np.asarray(dets["boxes"][0][keep]) / scale, 0.0, 1.0)
            return {
                "boxes": boxes.tolist(),
                "scores": np.asarray(dets["scores"][0][keep]).tolist(),
                "labels": np.asarray(dets["labels"][0][keep]).tolist(),
            }
        canvas = _resize_canvas(image_uint8, self.image_size)
        images = normalize_imagenet(jnp.asarray(canvas[None]))
        with self._lock:  # jitted fn is thread-safe, but keep request order
            dets = jax.device_get(self._predict(images))
        keep = dets["valid"][0]
        return {
            "boxes": np.asarray(dets["boxes"][0][keep]).tolist(),
            "scores": np.asarray(dets["scores"][0][keep]).tolist(),
            "labels": np.asarray(dets["labels"][0][keep]).tolist(),
        }


def _make_handler(service: DetectionService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("application/json"):
                    payload = json.loads(body)
                    body = base64.b64decode(payload["image_b64"])
                from PIL import Image

                image = np.asarray(
                    Image.open(io.BytesIO(body)).convert("RGB"), dtype=np.uint8
                )
                self._send(200, service.predict_image(image))
            except Exception as e:  # noqa: BLE001 — report to the client
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("object_detection_destr_tpu serve")
    p.add_argument("--model", choices=["destr", "ssd"], default="destr")
    p.add_argument("--checkpoint_dir", type=str, default="checkpoints")
    p.add_argument("--weights", type=str, default="model_weights")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8900)
    p.add_argument("--score_thresh", type=float, default=0.5)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--letterbox", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="aspect-preserving DESTR serving (default since r4); "
                        "--no-letterbox restores the square stretch")
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--ffn_dim", type=int, default=2048)
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--num_encoder_blocks", type=int, default=6)
    p.add_argument("--num_decoder_blocks", type=int, default=6)
    p.add_argument("--top_k", type=int, default=300)
    p.add_argument("--num_cls", type=int, default=2)
    p.add_argument("--backbone", type=str, default="resnet50")
    return p


def build_service(args) -> DetectionService:
    size = args.image_size or (640 if args.model == "destr" else 300)
    restored = restore_for_inference(args.checkpoint_dir, args.weights)
    variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}
    anchors = None
    if args.model == "destr":
        cfg = DestrConfig(
            hidden_dim=args.hidden_dim, ffn_dim=args.ffn_dim,
            num_heads=args.num_heads,
            num_encoder_blocks=args.num_encoder_blocks,
            num_decoder_blocks=args.num_decoder_blocks,
            top_k=args.top_k, num_cls=args.num_cls, backbone=args.backbone,
        )
        model = build_destr(cfg)
    else:
        cfg = SSDConfig(num_cls=args.num_cls if args.num_cls != 2 else 20)
        model = build_ssd(cfg)
        anchors = flat_anchors(cfg)
    return DetectionService(
        args.model, model, variables, size, args.score_thresh, anchors,
        letterbox=getattr(args, "letterbox", True),
    )


def serve(argv=None):
    args = get_parser().parse_args(argv)
    service = build_service(args)
    server = ThreadingHTTPServer((args.host, args.port), _make_handler(service))
    print(f"serving {args.model} on http://{args.host}:{args.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    serve()
