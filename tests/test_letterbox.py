"""Aspect-preserving (letterbox) data path: loader geometry, pixel valid
masks through the train transform, reference-exact eval geometry, and the
end-to-end driver flag.

Reference geometry being matched: src/dataset/transforms.py:170-181 (val =
Resize shorter side to 672 + CenterCrop 640, aspect preserved). The default
square-stretch path distorts non-square images; VERDICT r1 item 6.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from object_detection_destr_tpu.data.loader import DetectionLoader  # noqa: E402
from object_detection_destr_tpu.data.transforms import (  # noqa: E402
    destr_eval_transform,
    destr_train_transform,
    letterbox_infer_transform,
)


class _NonSquareDataset:
    """Two fixed non-square images with one box each (known geometry)."""

    def __init__(self):
        img_tall = np.zeros((200, 100, 3), np.uint8)
        img_tall[:, :, 0] = 200
        img_wide = np.full((80, 160, 3), 90, np.uint8)
        self.items = [
            (img_tall, np.asarray([[0.2, 0.1, 0.6, 0.5]], np.float32),
             np.zeros(1, np.int32)),
            (img_wide, np.asarray([[0.5, 0.25, 0.9, 0.75]], np.float32),
             np.zeros(1, np.int32)),
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_letterbox_loader_geometry():
    loader = DetectionLoader(
        _NonSquareDataset(), batch_size=2, canvas_size=100, max_targets=4,
        shuffle=False, prefetch=0, num_workers=0, letterbox=True,
    )
    batch = next(iter(loader))
    assert batch["images"].shape == (2, 100, 100, 3)
    # tall image: 200x100 -> scale 0.5 -> 100x50 content
    np.testing.assert_allclose(batch["content_hw"][0], [1.0, 0.5])
    # wide image: 80x160 -> scale 100/160 -> 50x100 content
    np.testing.assert_allclose(batch["content_hw"][1], [0.5, 1.0])
    # padding is zero, content is not
    assert batch["images"][0, :, 50:].sum() == 0
    assert batch["images"][0, :, :50].sum() > 0
    assert batch["images"][1, 50:, :].sum() == 0
    # boxes re-normalized to canvas coords: x scaled by fw, y by fh
    np.testing.assert_allclose(
        batch["boxes"][0, 0], [0.2 * 0.5, 0.1, 0.6 * 0.5, 0.5], atol=1e-6
    )
    np.testing.assert_allclose(
        batch["boxes"][1, 0], [0.5, 0.25 * 0.5, 0.9, 0.75 * 0.5], atol=1e-6
    )


def test_letterbox_train_transform_emits_real_padding_mask():
    """With non-square content, sampled crops extend into the padding for
    aspect ratios that don't fit — the output pixel_valid must mark it, and
    all surviving boxes must live inside the valid region."""
    rng = np.random.default_rng(0)
    b, c, s = 4, 64, 32
    images = rng.integers(0, 255, size=(b, c, c, 3), dtype=np.uint8)
    boxes = np.tile(np.asarray([[0.1, 0.1, 0.3, 0.3]], np.float32), (b, 1, 1))
    labels = np.zeros((b, 1), np.int32)
    valid = np.ones((b, 1), bool)
    content = np.tile(np.asarray([1.0, 0.4], np.float32), (b, 1))  # tall content
    boxes = boxes * np.asarray([0.4, 1.0, 0.4, 1.0], np.float32)

    saw_padding = False
    for seed in range(6):
        out = destr_train_transform(
            jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(valid), jax.random.key(seed), jnp.asarray(content),
            out_size=s,
        )
        assert out["pixel_valid"].shape == (b, s, s)
        pv = np.asarray(out["pixel_valid"])
        if (~pv).any():
            saw_padding = True
        # surviving boxes stay inside columns/rows that contain valid pixels
        ob, ov = np.asarray(out["boxes"]), np.asarray(out["valid"])
        for i in range(b):
            if not ov[i].any():
                continue
            col_valid = pv[i].any(axis=0)  # (S,)
            if col_valid.all():
                continue
            # contiguous valid span (left- or right-aligned after flip)
            first = col_valid.argmax()
            last = s - 1 - col_valid[::-1].argmax()
            x1 = ob[i, ov[i], 0]
            x2 = ob[i, ov[i], 2]
            assert (x1 >= first / s - 2.0 / s).all()
            assert (x2 <= (last + 1) / s + 2.0 / s).all()
    assert saw_padding, "no sampled crop ever touched the padding"

    # stretch path is unchanged: no pixel_valid key
    out = destr_train_transform(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(valid), jax.random.key(0), out_size=s,
    )
    assert "pixel_valid" not in out


def test_letterbox_eval_matches_reference_val_geometry():
    """Our letterbox + eval transform must equal the reference's val pipeline
    (shorter-side resize + center crop, src/dataset/transforms.py:170-181):
    boxes exactly (analytic geometry), pixels loosely (different bilinear
    resamplers)."""
    from PIL import Image

    rng = np.random.default_rng(3)
    ih, iw = 300, 480  # wide, non-square
    resize_to, out_size = 96, 80  # scaled-down 672/640
    image = rng.integers(0, 255, size=(ih, iw, 3), dtype=np.uint8)
    boxes = np.asarray([[0.3, 0.2, 0.7, 0.9], [0.45, 0.4, 0.55, 0.6]], np.float32)

    # --- reference pipeline on the original image ------------------------
    s1 = resize_to / min(ih, iw)
    rh, rw = round(ih * s1), round(iw * s1)
    resized = np.asarray(
        Image.fromarray(image).resize((rw, rh), Image.BILINEAR), np.float32
    )
    y0, x0 = (rh - out_size) // 2, (rw - out_size) // 2
    ref_pixels = resized[y0 : y0 + out_size, x0 : x0 + out_size]
    px = boxes * np.asarray([iw, ih, iw, ih], np.float32)
    ref_boxes = (px * s1 - np.asarray([x0, y0, x0, y0])) / out_size
    ref_boxes = np.clip(ref_boxes, 0.0, 1.0)

    # --- our pipeline: letterbox canvas -> eval transform -----------------
    class _One:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return image, boxes, np.zeros(len(boxes), np.int32)

    canvas = resize_to * 5  # divisible sizes keep rounding exact
    loader = DetectionLoader(
        _One(), batch_size=1, canvas_size=canvas, max_targets=4,
        shuffle=False, prefetch=0, num_workers=0, letterbox=True,
    )
    batch = next(iter(loader))
    out = destr_eval_transform(
        jnp.asarray(batch["images"]), jnp.asarray(batch["boxes"]),
        jnp.asarray(batch["labels"]), jnp.asarray(batch["valid"]),
        jnp.asarray(batch["content_hw"]), resize_to=resize_to, out_size=out_size,
    )
    ours_boxes = np.asarray(out["boxes"])[0, : len(boxes)]
    np.testing.assert_allclose(ours_boxes, ref_boxes, atol=5e-3)

    # pixels: un-normalize and compare means (two resamplers, two scales)
    from object_detection_destr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    ours_pixels = (
        np.asarray(out["images"][0])
        * (np.asarray(IMAGENET_STD) * 255.0)
        + np.asarray(IMAGENET_MEAN) * 255.0
    )
    assert np.abs(ours_pixels - ref_pixels).mean() < 12.0


def test_letterbox_infer_transform_mask():
    rng = np.random.default_rng(5)
    images = rng.integers(0, 255, size=(2, 64, 64, 3), dtype=np.uint8)
    content = jnp.asarray([[1.0, 0.5], [0.25, 1.0]], jnp.float32)
    out = letterbox_infer_transform(jnp.asarray(images), content, out_size=32)
    pv = np.asarray(out["pixel_valid"])
    assert pv[0, :, :16].all() and not pv[0, :, 16:].any()
    assert pv[1, :8, :].all() and not pv[1, 8:, :].any()


def test_letterbox_driver_end_to_end(tmp_path):
    """Driver flag: letterbox path trains and validates end to end — the
    model's pixel-mask plumbing sees real padding (mixed-aspect synthetic)."""
    from object_detection_destr_tpu.config import (
        Config, DataConfig, DestrConfig, TrainConfig,
    )
    from object_detection_destr_tpu.train.driver import train_destr

    tiny = DestrConfig(
        hidden_dim=32, num_heads=4, num_encoder_blocks=1, num_decoder_blocks=1,
        top_k=4, ffn_dim=64, dropout=0.0,
    )
    config = Config(
        destr=tiny,
        train=TrainConfig(
            batch_size=2, image_size=64, epochs=1, lr=1e-3, lr_backbone=0.0,
            checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "runs"),
            log_interval=2, letterbox=True,
        ),
        data=DataConfig(
            dataset="synthetic", image_size=80, num_train_samples=4,
            num_valid_samples=2, augment_factor=1, max_targets=8,
        ),
    )
    result = train_destr(config)
    assert np.isfinite(result["best_val"])


def test_predict_cli_letterbox(tmp_path):
    """--letterbox serving: non-square input, masked model call, boxes back
    in original-image coordinates (untrained weights; contract only)."""
    from PIL import Image

    from object_detection_destr_tpu.config import DestrConfig, TrainConfig
    from object_detection_destr_tpu.infer.cli import main as predict_main
    from object_detection_destr_tpu.models.destr.model import build_destr
    from object_detection_destr_tpu.train.checkpoint import save_checkpoint
    from object_detection_destr_tpu.train.state import create_destr_state

    tiny = DestrConfig(
        hidden_dim=32, num_heads=4, num_encoder_blocks=1, num_decoder_blocks=1,
        top_k=4, ffn_dim=64, dropout=0.0,
    )
    model = build_destr(tiny)
    state, _ = create_destr_state(
        model, TrainConfig(lr=1e-3, lr_backbone=0.0), image_size=64
    )
    save_checkpoint(str(tmp_path / "ckpt"), "model_weights", state)

    img_path = str(tmp_path / "wide.jpg")
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, size=(60, 120, 3), dtype=np.uint8)
    ).save(img_path)

    records = predict_main(
        [
            "--model", "destr",
            "--checkpoint_dir", str(tmp_path / "ckpt"),
            "--weights", "model_weights",
            "--images", img_path,
            "--output", str(tmp_path / "dets.json"),
            "--image_size", "64",
            "--hidden_dim", "32",
            "--num_heads", "4",
            "--num_encoder_blocks", "1",
            "--num_decoder_blocks", "1",
            "--ffn_dim", "64",
            "--top_k", "4",
            "--score_thresh", "0.0",
            "--letterbox",
        ]
    )
    assert len(records) == 1
    for box in records[0]["boxes"]:
        assert all(0.0 <= v <= 1.0 for v in box)


def test_letterbox_eval_is_default_geometry():
    """r4 default flip (REFCOMPAT "letterbox eval geometry"): with a default
    TrainConfig the DESTR val loader letterboxes (reference aspect-preserving
    eval) while the train loader keeps the square stretch; --no-letterbox_eval
    restores the pre-r4 behavior; SSD is unaffected."""
    import dataclasses

    from object_detection_destr_tpu.config import Config, DataConfig, TrainConfig
    from object_detection_destr_tpu.train.arg_parser import (
        config_from_args,
        get_parser,
    )
    from object_detection_destr_tpu.train.driver import _make_loaders

    config = Config(data=DataConfig(num_train_samples=4, num_valid_samples=2))
    assert config.train.letterbox_eval and not config.train.letterbox

    train_loader, valid_loader = _make_loaders(config, canvas=64, for_train_model="destr")
    assert not train_loader.letterbox and valid_loader.letterbox

    off = dataclasses.replace(config, train=TrainConfig(letterbox_eval=False))
    train_loader, valid_loader = _make_loaders(off, canvas=64, for_train_model="destr")
    assert not train_loader.letterbox and not valid_loader.letterbox

    # SSD: its reference stretches at eval too (transforms.py:141-152)
    _, ssd_valid = _make_loaders(config, canvas=64, for_train_model="ssd")
    assert not ssd_valid.letterbox

    # CLI wiring: default on, --no-letterbox_eval off
    args = get_parser("destr").parse_args([])
    assert config_from_args(args, "destr").train.letterbox_eval
    args = get_parser("destr").parse_args(["--no-letterbox_eval"])
    assert not config_from_args(args, "destr").train.letterbox_eval
