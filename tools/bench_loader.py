"""Host input-pipeline throughput benchmark (VERDICT r3 #4).

Measures ``DetectionLoader`` images/sec at a production config with REAL
JPEG bytes through the native fused decode+resize path
(runtime/cc/jpeg_decode.cc), answering: can the host feed the chip's
device rate (BASELINE.md bench of record)?

Without ``--root`` it materializes a synthetic COCO-layout corpus on disk
(JPEG files + instances JSON, non-square images) so the measured path is
the real one end to end: file read -> annotation parse -> fused native
decode+resize -> padded batch. ``--root/--dataset`` points at a real
WIDER FACE / VOC / COCO tree instead.

    python tools/bench_loader.py [--num-images 512] [--image-hw 800 600]
        [--batch_size 8] [--canvas 672] [--num_workers 8] [--letterbox]
        [--no-native] [--decode-only]

Prints one JSON line with images/sec plus the decode path used.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_synthetic_coco(root: str, n: int, hw, quality: int = 90, seed: int = 0):
    """COCO-layout corpus: root/train2017/*.jpg + annotations JSON."""
    from PIL import Image

    from object_detection_destr_tpu.data.datasets import SyntheticDetection

    img_dir = os.path.join(root, "train2017")
    ann_dir = os.path.join(root, "annotations")
    marker = os.path.join(root, f"corpus_{n}_{hw[0]}x{hw[1]}_q{quality}.ok")
    if os.path.exists(marker):
        return
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    ds = SyntheticDetection(
        num_samples=n, image_size=hw[0], max_boxes=6, seed=seed,
        aspect_ratios=(hw[1] / hw[0],),
    )
    images, annotations = [], []
    ann_id = 1
    for i in range(n):
        img, boxes, _ = ds[i]
        h, w = img.shape[:2]
        name = f"{i:012d}.jpg"
        Image.fromarray(img).save(os.path.join(img_dir, name), quality=quality)
        images.append({"id": i, "file_name": name, "width": w, "height": h})
        for b in boxes:
            x1, y1, x2, y2 = (b * [w, h, w, h]).tolist()
            annotations.append(
                {"id": ann_id, "image_id": i, "category_id": 1,
                 "bbox": [x1, y1, x2 - x1, y2 - y1], "iscrowd": 0}
            )
            ann_id += 1
    with open(os.path.join(ann_dir, "instances_train2017.json"), "w") as f:
        json.dump(
            {"images": images, "annotations": annotations,
             "categories": [{"id": 1, "name": "object"}]}, f)
    open(marker, "w").close()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default=None,
                    help="real dataset root; default: synthetic JPEG corpus")
    ap.add_argument("--dataset", type=str, default="coco",
                    choices=["coco", "widerface", "voc"])
    ap.add_argument("--split", type=str, default="train")
    ap.add_argument("--num-images", type=int, default=512)
    ap.add_argument("--image-hw", type=int, nargs=2, default=(600, 800),
                    help="synthetic corpus decode size (h w), non-square")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--canvas", type=int, default=672)
    ap.add_argument("--max_targets", type=int, default=300)
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--prefetch", type=int, default=2)
    ap.add_argument("--num-batches", type=int, default=0,
                    help="0 = one full pass")
    ap.add_argument("--letterbox", action="store_true")
    ap.add_argument("--no-native", action="store_true",
                    help="disable the C++ runtime (cv2/PIL fallback path)")
    ap.add_argument("--decode-only", action="store_true",
                    help="also time the bare native fused decode+resize call "
                         "over the corpus bytes (no loader, no annotations)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--workers-sweep", type=str, default=None,
                    help="comma-separated worker counts (e.g. 1,2,4,8): "
                         "measure img/s at each and record the per-worker "
                         "scaling — the honest basis for the 'decode "
                         "thread-pool scales with cores' claim (on a "
                         "1-core host all counts measure the same rate "
                         "by construction, BASELINE.md r4/r5)")
    args = ap.parse_args(argv)

    from object_detection_destr_tpu.data.datasets import build_dataset
    from object_detection_destr_tpu.data.loader import DetectionLoader
    from object_detection_destr_tpu.runtime import native

    if args.no_native:
        native._load_failed = True  # force the cv2/PIL path

    root = args.root
    if root is None:
        root = f"/tmp/bench_loader_corpus_{args.num_images}"
        build_synthetic_coco(root, args.num_images, tuple(args.image_hw))
    ds = build_dataset(args.dataset, root, args.split)

    def measure(num_workers: int) -> float:
        loader = DetectionLoader(
            ds, batch_size=args.batch_size, canvas_size=args.canvas,
            max_targets=args.max_targets, shuffle=True, seed=0,
            prefetch=args.prefetch, num_workers=num_workers,
            letterbox=args.letterbox,
        )
        n_batches = args.num_batches or len(loader)
        best = None
        for _ in range(args.repeats):
            it = iter(loader)
            next(it)  # warm the pool / page cache outside the window
            t0 = time.perf_counter()
            count = 0
            for batch in it:
                count += batch["images"].shape[0]
                if count >= (n_batches - 1) * args.batch_size:
                    break
            dt = time.perf_counter() - t0
            rate = count / dt
            best = rate if best is None else max(best, rate)
        return best

    path = (
        "letterbox(cv2)" if args.letterbox else
        "native fused decode+resize" if native.is_available() and hasattr(ds, "raw_item")
        else "native batch_resize" if native.is_available()
        else "cv2/PIL"
    )
    best = measure(args.num_workers)

    result = {
        "metric": (
            f"host loader images/sec ({args.dataset}, canvas {args.canvas}, "
            f"b{args.batch_size}, {args.num_workers} workers, {path}, "
            f"{os.cpu_count()} host cores)"
        ),
        "value": round(best, 1),
        "unit": "images/sec",
    }

    if args.workers_sweep:
        counts = [int(x) for x in args.workers_sweep.split(",")]
        result["host_cores"] = os.cpu_count()
        result["workers_sweep"] = {
            str(n): round(measure(n), 1) for n in counts
        }

    if args.decode_only and native.is_available() and hasattr(ds, "raw_item"):
        blobs = [ds.raw_item(i)[0] for i in range(min(len(ds), 256))]
        native.batch_decode_resize(blobs[: args.batch_size], args.canvas)  # warm
        t0 = time.perf_counter()
        reps = max(1, 256 // len(blobs))
        for _ in range(reps):
            for lo in range(0, len(blobs), args.batch_size):
                native.batch_decode_resize(blobs[lo : lo + args.batch_size], args.canvas)
        dt = time.perf_counter() - t0
        result["decode_only_images_per_sec"] = round(reps * len(blobs) / dt, 1)

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
