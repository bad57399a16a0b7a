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
