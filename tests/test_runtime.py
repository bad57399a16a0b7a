"""Native runtime tests: build, ABI, and resize parity vs cv2."""

import numpy as np
import pytest

from object_detection_destr_tpu.runtime import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.is_available():
        pytest.skip("g++ unavailable or build failed")
    return True


def test_batch_resize_matches_cv2(lib_available):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    images = [
        rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        for h, w in [(48, 64), (100, 30), (64, 64)]
    ]
    canvas = 56
    out = native.batch_resize(images, canvas)
    assert out.shape == (3, canvas, canvas, 3)
    for i, img in enumerate(images):
        ref = cv2.resize(img, (canvas, canvas), interpolation=cv2.INTER_LINEAR)
        # same half-pixel-center convention; allow rounding off-by-one
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert np.mean(diff) < 1.0
        assert np.percentile(diff, 99) <= 2


def test_batch_resize_identity(lib_available):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
    out = native.batch_resize([img], 32)
    np.testing.assert_array_equal(out[0], img)


def test_loader_uses_native_path(lib_available):
    from object_detection_destr_tpu.data import DetectionLoader, SyntheticDetection

    ds = SyntheticDetection(num_samples=4, image_size=48)
    loader = DetectionLoader(ds, batch_size=2, canvas_size=64, max_targets=8,
                             prefetch=0)
    batch = next(iter(loader))
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["images"].any()


def test_batch_decode_resize_parity_with_pil(lib_available):
    import io

    from PIL import Image

    rng = np.random.default_rng(2)
    blobs = []
    for h, w in [(60, 80), (100, 64)]:
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=92)
        blobs.append(buf.getvalue())
    out = native.batch_decode_resize(blobs, 48)
    assert out.shape == (2, 48, 48, 3)
    cv2 = pytest.importorskip("cv2")
    for i, b in enumerate(blobs):
        ref = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
        ref_r = cv2.resize(ref, (48, 48), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(out[i].astype(int) - ref_r.astype(int))
        # same full-scale decode + same resampling convention -> ~1 LSB
        assert np.percentile(diff, 99) <= 2, diff.max()


def test_batch_decode_resize_dct_downscale_path(lib_available):
    """Sources much larger than the canvas take libjpeg's DCT-domain
    downscale (different resampling chain than full decode + resize) —
    assert visual agreement, not bit equality."""
    import io

    from PIL import Image

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(640, 480, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92)
    out = native.batch_decode_resize([buf.getvalue()], 64)
    cv2 = pytest.importorskip("cv2")
    ref = cv2.resize(
        np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB")),
        (64, 64), interpolation=cv2.INTER_AREA,
    )
    diff = np.abs(out[0].astype(int) - ref.astype(int))
    assert diff.mean() < 30  # pure-noise source: resampling chains differ


def test_batch_decode_resize_corrupt_blob_errors(lib_available):
    with pytest.raises(ValueError, match="index 0"):
        native.batch_decode_resize([b"definitely not a jpeg"], 32)


def test_loader_uses_native_jpeg_path(lib_available, tmp_path):
    """COCO-backed loader takes the fused decode+resize path end to end."""
    import io
    import json as _json

    from PIL import Image

    from object_detection_destr_tpu.data import DetectionLoader
    from object_detection_destr_tpu.data.datasets import CocoDetection

    rng = np.random.default_rng(4)
    (tmp_path / "train2017").mkdir()
    (tmp_path / "annotations").mkdir()
    images, annotations = [], []
    for i in range(4):
        img = rng.integers(0, 255, size=(50, 70, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / "train2017" / f"{i}.jpg")
        images.append({"id": i, "file_name": f"{i}.jpg", "width": 70, "height": 50})
        annotations.append(
            {"id": i, "image_id": i, "category_id": 1,
             "bbox": [7, 5, 35, 25], "iscrowd": 0}
        )
    (tmp_path / "annotations" / "instances_train2017.json").write_text(
        _json.dumps({"images": images, "annotations": annotations,
                     "categories": [{"id": 1, "name": "x"}]})
    )
    ds = CocoDetection(str(tmp_path), "train2017")
    loader = DetectionLoader(ds, batch_size=2, canvas_size=64, max_targets=4,
                             prefetch=0)
    batch = next(iter(loader))
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["images"].any()
    np.testing.assert_allclose(
        batch["boxes"][0, 0], [0.1, 0.1, 0.6, 0.6], atol=1e-6
    )
    assert batch["valid"][0, 0] and not batch["valid"][0, 1]
