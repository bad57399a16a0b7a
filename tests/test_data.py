"""Data pipeline tests: readers (tiny on-disk fixtures), loader padding and
determinism, and device-side transform geometry."""

import json
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from object_detection_destr_tpu.data import (  # noqa: E402
    DetectionLoader,
    SyntheticDetection,
    VocDetection,
    WiderFaceDetection,
    destr_eval_transform,
    destr_train_transform,
    ssd_train_transform,
)
from object_detection_destr_tpu.data.datasets import CocoDetection  # noqa: E402


def test_synthetic_dataset_deterministic():
    ds = SyntheticDetection(num_samples=4, image_size=64, seed=3)
    img1, boxes1, labels1 = ds[2]
    img2, boxes2, labels2 = ds[2]
    np.testing.assert_array_equal(img1, img2)
    np.testing.assert_array_equal(boxes1, boxes2)
    assert img1.shape == (64, 64, 3) and boxes1.shape[1] == 4
    assert (boxes1 >= 0).all() and (boxes1 <= 1).all()


def test_loader_padding_and_virtual_epochs():
    ds = SyntheticDetection(num_samples=5, image_size=64, max_boxes=3)
    loader = DetectionLoader(
        ds, batch_size=4, canvas_size=96, max_targets=10, augment_factor=2,
        shuffle=True, seed=1, prefetch=0,
    )
    assert loader.num_samples == 10
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (4, 96, 96, 3)
    assert b["boxes"].shape == (4, 10, 4)
    assert b["valid"].dtype == bool
    # padded rows are invalid
    assert (~b["valid"][:, 5:]).all()


def test_loader_resume_replays_order():
    ds = SyntheticDetection(num_samples=8, image_size=32)
    mk = lambda: DetectionLoader(
        ds, batch_size=2, canvas_size=32, max_targets=8, shuffle=True, seed=7,
        prefetch=0,
    )
    l1 = mk()
    it = iter(l1)
    first = next(it)
    state = l1.state_dict()
    second = next(it)
    l2 = mk()
    l2.load_state_dict(state)
    resumed = next(iter(l2))
    np.testing.assert_array_equal(second["images"], resumed["images"])
    del first


def test_loader_state_dict_before_iteration_and_fixed_point():
    """state_dict() must work on a fresh loader (the r5 post-mortem tool
    calls it before iterating) and be a fixed point through
    load_state_dict — a restored loader reports the state it was given."""
    ds = SyntheticDetection(num_samples=8, image_size=32)
    loader = DetectionLoader(
        ds, batch_size=2, canvas_size=32, max_targets=8, shuffle=True, seed=7,
        prefetch=0,
    )
    assert loader.state_dict() == {"epoch": 0, "step": 0}
    loader.load_state_dict({"epoch": 3, "step": 1})
    assert loader.state_dict() == {"epoch": 3, "step": 1}


def _fake_batch(rng, b=2, canvas=64, t=5):
    images = rng.integers(0, 255, size=(b, canvas, canvas, 3), dtype=np.uint8)
    boxes = np.stack(
        [
            rng.uniform(0.1, 0.5, size=(b, t)),
            rng.uniform(0.1, 0.5, size=(b, t)),
            rng.uniform(0.55, 0.9, size=(b, t)),
            rng.uniform(0.55, 0.9, size=(b, t)),
        ],
        -1,
    ).astype(np.float32)
    labels = np.zeros((b, t), np.int32)
    valid = np.ones((b, t), bool)
    valid[0, -1] = False
    return images, boxes, labels, valid


def test_destr_train_transform_shapes_and_ranges():
    rng = np.random.default_rng(0)
    images, boxes, labels, valid = _fake_batch(rng)
    out = destr_train_transform(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(valid), jax.random.key(0), out_size=32,
    )
    assert out["images"].shape == (2, 32, 32, 3)
    assert out["images"].dtype == jnp.float32
    b = np.asarray(out["boxes"])
    assert (b >= 0).all() and (b <= 1).all()
    # previously-invalid targets stay invalid
    assert not np.asarray(out["valid"])[0, -1]


def test_destr_eval_transform_center_crop_geometry():
    """A box centered in the image survives the 672->640 center crop with
    coordinates scaled by resize/crop ratio."""
    canvas = 84  # stand-in for 672; crop 80 stands in for 640
    images = np.zeros((1, canvas, canvas, 3), np.uint8)
    boxes = np.asarray([[[0.25, 0.25, 0.75, 0.75]]], np.float32)
    out = destr_eval_transform(
        jnp.asarray(images), jnp.asarray(boxes),
        jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 1), bool),
        resize_to=84, out_size=80,
    )
    got = np.asarray(out["boxes"])[0, 0]
    # window = central 80/84 of the canvas
    ratio = 84 / 80
    expected_half = 0.25 * ratio  # (0.5 - 0.25) scaled around center 0.5
    np.testing.assert_allclose(
        got, [0.5 - expected_half, 0.5 - expected_half, 0.5 + expected_half, 0.5 + expected_half],
        atol=1e-5,
    )


def test_ssd_train_transform_outputs_cxcyhw():
    rng = np.random.default_rng(1)
    images, boxes, labels, valid = _fake_batch(rng)
    out = ssd_train_transform(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(valid), jax.random.key(1), out_size=32,
    )
    assert out["images"].shape == (2, 32, 32, 3)
    b = np.asarray(out["boxes"])
    assert (b >= 0).all() and (b <= 1).all()  # cxcyhw all in [0,1]


def test_widerface_reader(tmp_path):
    root = tmp_path
    (root / "wider_face_split").mkdir()
    img_dir = root / "WIDER_train" / "images" / "0--Parade"
    img_dir.mkdir(parents=True)
    from PIL import Image

    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(img_dir / "a.jpg")
    ann = "\n".join(
        [
            "0--Parade/a.jpg",
            "2",
            "6 8 12 10 0 0 0 0 0 0",
            "30 20 18 16 0 0 0 0 0 0",
            "0--Parade/a.jpg",
            "0",
            "0 0 0 0 0 0 0 0 0 0",
            "",
        ]
    )
    (root / "wider_face_split" / "wider_face_train_bbx_gt.txt").write_text(ann)
    ds = WiderFaceDetection(str(root), "train")
    assert len(ds) == 2
    img, boxes, labels = ds[0]
    assert img.shape == (40, 60, 3)
    assert boxes.shape == (2, 4)
    # sorted by area desc: 18*16 > 12*10
    np.testing.assert_allclose(boxes[0], [30 / 60, 20 / 40, 48 / 60, 36 / 40], atol=1e-6)
    assert (labels == 0).all()
    img0, boxes0, _ = ds[1]
    assert boxes0.shape == (0, 4)


def test_voc_reader(tmp_path):
    base = tmp_path / "VOCdevkit" / "VOC2007"
    for sub in ["ImageSets/Main", "Annotations", "JPEGImages"]:
        (base / sub).mkdir(parents=True)
    (base / "ImageSets" / "Main" / "train.txt").write_text("000001\n")
    from PIL import Image

    Image.fromarray(np.zeros((50, 100, 3), np.uint8)).save(
        base / "JPEGImages" / "000001.jpg"
    )
    root_el = ET.Element("annotation")
    obj = ET.SubElement(root_el, "object")
    ET.SubElement(obj, "name").text = "dog"
    bb = ET.SubElement(obj, "bndbox")
    for tag, v in [("xmin", 10), ("ymin", 5), ("xmax", 60), ("ymax", 45)]:
        ET.SubElement(bb, tag).text = str(v)
    ET.ElementTree(root_el).write(base / "Annotations" / "000001.xml")
    ds = VocDetection(str(tmp_path), "train")
    img, boxes, labels = ds[0]
    assert img.shape == (50, 100, 3)
    np.testing.assert_allclose(boxes[0], [0.1, 0.1, 0.6, 0.9], atol=1e-6)
    assert labels[0] == 4  # dog — reference map order (src/dataset/dataset.py:76-97)


def test_coco_reader(tmp_path):
    root = tmp_path
    (root / "annotations").mkdir()
    (root / "train2017").mkdir()
    from PIL import Image

    Image.fromarray(np.zeros((80, 40, 3), np.uint8)).save(root / "train2017" / "x.jpg")
    coco = {
        "images": [{"id": 1, "file_name": "x.jpg", "width": 40, "height": 80}],
        "annotations": [
            {"id": 9, "image_id": 1, "category_id": 17, "bbox": [4, 8, 20, 40], "iscrowd": 0}
        ],
        "categories": [{"id": 17, "name": "cat"}, {"id": 18, "name": "dog"}],
    }
    (root / "annotations" / "instances_train2017.json").write_text(json.dumps(coco))
    ds = CocoDetection(str(root), "train2017")
    img, boxes, labels = ds[0]
    assert img.shape == (80, 40, 3)
    np.testing.assert_allclose(boxes[0], [0.1, 0.1, 0.6, 0.6], atol=1e-6)
    assert labels[0] == 0 and ds.num_classes == 2


def test_widerface_reader_format_edge_cases(tmp_path):
    """Known WIDER annotation quirks: zero-size (invalid) rows inside a
    nonzero count, extra attribute columns, and the invalid-flag column
    (kept when the box has area — matches the reference, which filters only
    degenerate boxes via filter_flat_box)."""
    root = tmp_path
    (root / "wider_face_split").mkdir()
    img_dir = root / "WIDER_train" / "images" / "2--Demo"
    img_dir.mkdir(parents=True)
    from PIL import Image

    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(img_dir / "b.jpg")
    ann = "\n".join(
        [
            "2--Demo/b.jpg",
            "3",
            "6 8 12 10 0 0 0 1 0 0",   # invalid-flag set, box has area: kept
            "0 0 0 0 0 0 0 0 0 0",      # zero-size row inside count=3: dropped
            "30 20 18 16 2 0 1 0 1 0",  # blur/occlusion attrs nonzero: kept
            "",
        ]
    )
    (root / "wider_face_split" / "wider_face_train_bbx_gt.txt").write_text(ann)
    ds = WiderFaceDetection(str(root), "train")
    assert len(ds) == 1
    _, boxes, labels = ds[0]
    assert boxes.shape == (2, 4)
    assert (labels == 0).all()


def test_voc_difficult_flag(tmp_path):
    """keep_difficult=True (reference behavior) keeps difficult objects;
    False drops them (standard VOC eval protocol)."""
    base = tmp_path / "VOCdevkit" / "VOC2007"
    for sub in ["ImageSets/Main", "Annotations", "JPEGImages"]:
        (base / sub).mkdir(parents=True)
    (base / "ImageSets" / "Main" / "train.txt").write_text("000002\n")
    from PIL import Image

    Image.fromarray(np.zeros((50, 100, 3), np.uint8)).save(
        base / "JPEGImages" / "000002.jpg"
    )
    root_el = ET.Element("annotation")
    for name, difficult, x1 in [("Dog ", "0", 10), ("person", "1", 30)]:
        obj = ET.SubElement(root_el, "object")
        ET.SubElement(obj, "name").text = name  # case/space: ref lower().strip()s
        ET.SubElement(obj, "difficult").text = difficult
        bb = ET.SubElement(obj, "bndbox")
        for tag, v in [("xmin", x1), ("ymin", 5), ("xmax", x1 + 20), ("ymax", 45)]:
            ET.SubElement(bb, tag).text = str(v)
    ET.ElementTree(root_el).write(base / "Annotations" / "000002.xml")

    ds = VocDetection(str(tmp_path), "train")  # reference behavior
    _, boxes, labels = ds[0]
    assert labels.tolist() == [4, 0]  # dog=4, person=0 in the reference map

    ds_eval = VocDetection(str(tmp_path), "train", keep_difficult=False)
    _, boxes, labels = ds_eval[0]
    assert labels.tolist() == [4]


def test_device_cache_matches_host_loader():
    """DeviceCachedLoader serves bit-identical batches in the identical
    order as the host DetectionLoader it wraps (same (seed, epoch) shuffle
    stream), across epochs and through a state_dict resume."""
    import jax.numpy as jnp  # noqa: F401  (device arrays come back)

    from object_detection_destr_tpu.data import (
        DetectionLoader,
        DeviceCachedLoader,
        SyntheticDetection,
    )

    mk = lambda: DetectionLoader(
        SyntheticDetection(num_samples=10, image_size=48, max_boxes=3),
        batch_size=4, canvas_size=56, max_targets=5, augment_factor=2,
        shuffle=True, seed=3, prefetch=0, num_workers=0, letterbox=True,
    )
    host = mk()
    cached = DeviceCachedLoader(mk(), build_chunk=3)
    assert len(host) == len(cached)

    for _ in range(2):  # two epochs: the shuffle stream advances identically
        # exhaust each iterator fully (zip would stop one next() short of
        # StopIteration on the second loader, skipping its epoch advance)
        host_batches, cached_batches = list(host), list(cached)
        assert len(host_batches) == len(cached_batches)
        for hb, cb in zip(host_batches, cached_batches):
            assert set(hb) == set(cb)
            for k in hb:
                np.testing.assert_array_equal(hb[k], np.asarray(cb[k]))

    # resume: restart mid-epoch from a saved state on a fresh cache
    state = cached.state_dict()
    ref_batches = list(host)
    resumed = DeviceCachedLoader(mk(), build_chunk=4)
    resumed.load_state_dict(state)
    res_batches = list(resumed)
    assert len(res_batches) == len(ref_batches)
    for hb, cb in zip(ref_batches, res_batches):
        for k in hb:
            np.testing.assert_array_equal(hb[k], np.asarray(cb[k]))


def test_raw_item_paths_widerface_voc(tmp_path):
    """raw_item on WIDER FACE and VOC (VERDICT r3 #4): JPEG bytes returned
    undecoded, dims from the SOF header / annotation XML, boxes identical to
    the decoded __getitem__ path."""
    from object_detection_destr_tpu.data.datasets import _jpeg_size

    # --- WIDER ---------------------------------------------------------
    root = tmp_path / "wider"
    (root / "wider_face_split").mkdir(parents=True)
    img_dir = root / "WIDER_train" / "images" / "0--Parade"
    img_dir.mkdir(parents=True)
    from PIL import Image

    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)).save(
        img_dir / "a.jpg", quality=95
    )
    (root / "wider_face_split" / "wider_face_train_bbx_gt.txt").write_text(
        "0--Parade/a.jpg\n2\n6 8 12 10 0 0 0 0 0 0\n30 20 18 16 0 0 0 0 0 0\n"
    )
    ds = WiderFaceDetection(str(root), "train")
    data, boxes, labels = ds.raw_item(0)
    assert isinstance(data, bytes) and data[:2] == b"\xff\xd8"
    assert _jpeg_size(data) == (40, 60)
    _, boxes_dec, labels_dec = ds[0]
    np.testing.assert_allclose(boxes, boxes_dec, atol=1e-6)
    np.testing.assert_array_equal(labels, labels_dec)

    # --- VOC -----------------------------------------------------------
    base = tmp_path / "voc" / "VOCdevkit" / "VOC2007"
    for sub in ["ImageSets/Main", "Annotations", "JPEGImages"]:
        (base / sub).mkdir(parents=True)
    (base / "ImageSets" / "Main" / "train.txt").write_text("000001\n")
    Image.fromarray(rng.integers(0, 255, (50, 100, 3), dtype=np.uint8)).save(
        base / "JPEGImages" / "000001.jpg"
    )
    root_el = ET.Element("annotation")
    size = ET.SubElement(root_el, "size")
    ET.SubElement(size, "width").text = "100"
    ET.SubElement(size, "height").text = "50"
    obj = ET.SubElement(root_el, "object")
    ET.SubElement(obj, "name").text = "dog"
    bb = ET.SubElement(obj, "bndbox")
    for tag, v in [("xmin", 10), ("ymin", 5), ("xmax", 60), ("ymax", 45)]:
        ET.SubElement(bb, tag).text = str(v)
    ET.ElementTree(root_el).write(base / "Annotations" / "000001.xml")
    vds = VocDetection(str(tmp_path / "voc"), "train")
    data, boxes, labels = vds.raw_item(0)
    assert isinstance(data, bytes)
    _, boxes_dec, labels_dec = vds[0]
    np.testing.assert_allclose(boxes, boxes_dec, atol=1e-6)
    np.testing.assert_array_equal(labels, labels_dec)

    # the loader's fused native path consumes these end to end
    from object_detection_destr_tpu.runtime import native

    if native.is_available():
        loader = DetectionLoader(
            ds, batch_size=1, canvas_size=32, max_targets=4,
            shuffle=False, prefetch=0, num_workers=0,
        )
        batch = next(iter(loader))
        assert batch["images"].shape == (1, 32, 32, 3)
        assert batch["valid"][0].sum() == 2
