"""Extra end-to-end coverage: the SSD epoch driver, ResNet-101/dilated
config, and the predict CLI against a driver-produced checkpoint."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from object_detection_destr_tpu.config import (  # noqa: E402
    Config,
    DataConfig,
    DestrConfig,
    SSDConfig,
    TrainConfig,
)


@pytest.mark.slow
def test_ssd_driver_end_to_end(tmp_path):
    from object_detection_destr_tpu.train.driver import train_ssd

    config = Config(
        ssd=SSDConfig(num_cls=3),
        train=TrainConfig(
            batch_size=2,
            epochs=1,
            lr=1e-3,
            checkpoint_dir=str(tmp_path / "ckpt"),
            log_dir=str(tmp_path / "runs"),
            log_interval=1,
        ),
        data=DataConfig(
            dataset="synthetic",
            image_size=128,
            num_train_samples=2,
            num_valid_samples=2,
            augment_factor=1,
            max_targets=8,
        ),
    )
    result = train_ssd(config)
    assert np.isfinite(result["best_val"])
    assert os.path.exists(os.path.join(str(tmp_path / "ckpt"), "model_weights"))


@pytest.mark.slow
def test_predict_cli_on_trained_checkpoint(tmp_path):
    """Train tiny DESTR via the driver, then run the predict CLI on an image
    — the full save -> restore -> predict serving loop."""
    from PIL import Image

    from object_detection_destr_tpu.infer.cli import main as predict_main
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
            log_interval=2,
        ),
        data=DataConfig(
            dataset="synthetic", image_size=80, num_train_samples=2,
            num_valid_samples=2, augment_factor=1, max_targets=8,
        ),
    )
    train_destr(config)

    img_path = str(tmp_path / "scene.jpg")
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, size=(80, 80, 3), dtype=np.uint8)).save(img_path)
    out_path = str(tmp_path / "dets.json")
    records = predict_main(
        [
            "--model", "destr",
            "--checkpoint_dir", str(tmp_path / "ckpt"),
            "--weights", "model_weights",
            "--images", img_path,
            "--output", out_path,
            "--image_size", "64",
            "--hidden_dim", "32",
            "--ffn_dim", "64",
            "--num_heads", "4",
            "--num_encoder_blocks", "1",
            "--num_decoder_blocks", "1",
            "--top_k", "4",
            "--score_thresh", "0.0",
        ]
    )
    assert len(records) == 1
    with open(out_path) as f:
        on_disk = json.load(f)
    assert on_disk[0]["file"] == img_path
    assert len(on_disk[0]["boxes"]) <= 4


def test_resnet101_dilated_destr_forward():
    """BASELINE.json config 4 shape: R101 backbone with dilated C5."""
    from object_detection_destr_tpu.models.destr.model import build_destr

    cfg = DestrConfig(
        hidden_dim=32, num_heads=4, num_encoder_blocks=1, num_decoder_blocks=1,
        top_k=4, ffn_dim=64, dropout=0.0, backbone="resnet101", dilation=True,
    )
    model = build_destr(cfg)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, images, train=False)
    model_out, det_out = model.apply(variables, images, train=False)
    # dilation: C5 at stride 16 -> 4x4 = 16 tokens
    assert det_out["pred_class"].shape[1] == 16
    assert model_out["pred_boxes"].shape == (1, 4, 4)


@pytest.mark.slow
def test_widerface_format_end_to_end(tmp_path):
    """Full driver run over an on-disk WIDER-FACE-format dataset (reader ->
    loader -> device augment -> train/val -> checkpoint), not just reader
    units."""
    import numpy as np
    from PIL import Image

    from object_detection_destr_tpu.train.driver import train_destr

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        img_dir = tmp_path / f"WIDER_{split}" / "images" / "0--Scene"
        img_dir.mkdir(parents=True)
        (tmp_path / "wider_face_split").mkdir(exist_ok=True)
        lines = []
        for i in range(4):
            img = rng.integers(0, 40, size=(64, 64, 3), dtype=np.uint8)
            img[20:40, 10:30] = [250, 20, 20]  # one bright face box
            Image.fromarray(img).save(img_dir / f"{i}.jpg")
            lines += [f"0--Scene/{i}.jpg", "1", "10 20 20 20 0 0 0 0 0 0"]
        (tmp_path / "wider_face_split" / f"wider_face_{split}_bbx_gt.txt").write_text(
            "\n".join(lines) + "\n"
        )

    config = Config(
        destr=DestrConfig(
            hidden_dim=32, num_heads=4, num_encoder_blocks=1, num_decoder_blocks=1,
            top_k=4, ffn_dim=64, dropout=0.0,
        ),
        train=TrainConfig(
            batch_size=2, image_size=64, epochs=1, lr=1e-3, lr_backbone=0.0,
            checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "runs"),
            log_interval=1,
        ),
        data=DataConfig(
            dataset="widerface", root=str(tmp_path), image_size=64,
            augment_factor=1, max_targets=8,
        ),
    )
    result = train_destr(config)
    assert np.isfinite(result["best_val"])
    assert os.path.exists(os.path.join(str(tmp_path / "ckpt"), "model_weights"))


@pytest.mark.slow
def test_coco_format_end_to_end(tmp_path):
    """Driver run over an on-disk COCO-format dataset (BASELINE.json's
    primary data family), reader -> loader -> train/val."""
    import json as _json

    import numpy as np
    from PIL import Image

    from object_detection_destr_tpu.train.driver import train_destr

    rng = np.random.default_rng(1)
    for split in ("train2017", "val2017"):
        (tmp_path / split).mkdir()
    (tmp_path / "annotations").mkdir()
    for split in ("train2017", "val2017"):
        images, annotations = [], []
        for i in range(4):
            img = rng.integers(0, 40, size=(64, 64, 3), dtype=np.uint8)
            img[16:48, 16:48] = [20, 240, 20]
            Image.fromarray(img).save(tmp_path / split / f"{i}.jpg")
            images.append({"id": i, "file_name": f"{i}.jpg", "width": 64, "height": 64})
            annotations.append(
                {"id": i, "image_id": i, "category_id": 7,
                 "bbox": [16, 16, 32, 32], "iscrowd": 0}
            )
        coco = {"images": images, "annotations": annotations,
                "categories": [{"id": 7, "name": "thing"}]}
        (tmp_path / "annotations" / f"instances_{split}.json").write_text(
            _json.dumps(coco)
        )

    config = Config(
        destr=DestrConfig(
            hidden_dim=32, num_heads=4, num_encoder_blocks=1, num_decoder_blocks=1,
            top_k=4, ffn_dim=64, dropout=0.0,
        ),
        train=TrainConfig(
            batch_size=2, image_size=64, epochs=1, lr=1e-3, lr_backbone=0.0,
            checkpoint_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "runs"),
            log_interval=1,
        ),
        data=DataConfig(
            dataset="coco", root=str(tmp_path), image_size=64,
            augment_factor=1, max_targets=8,
        ),
    )
    result = train_destr(config)
    assert np.isfinite(result["best_val"])
