"""Device-side, jit-compiled augmentation.

The reference augments per image on CPU DataLoader workers with torchvision
v2 joint transforms (src/dataset/transforms.py:121-182). Here augmentation is
a pure function over a whole padded batch, compiled by XLA and executed on
device — decode/letterbox is the only host work. Geometry runs on normalized
[0, 1] boxes so crops are pure affine math.

Pipelines mirrored (REFCOMPAT-noted deviations in docstrings):

* DESTR train: RandomResizedCrop(640, scale=(0.08, 1), ratio=(3/4, 4/3)) +
  RandomHorizontalFlip(0.5) + ImageNet normalize (transforms.py:160-169).
* DESTR eval: Resize(672) + CenterCrop(640) + normalize
  (transforms.py:170-181).
* SSD train: random IoU-bound patch (SSD-paper crop) + Resize(300) +
  normalize, boxes to cxcyhw (transforms.py:121-140). The reference retries
  a sampled mode up to 50x inside ``while True`` — unboundedly
  (transforms.py:83-118, SURVEY.md §5 notes the hang risk); here a fixed
  batch of K candidate crops is scored in parallel and the first admissible
  one wins, with identity fallback.
* SSD eval: resize + normalize (transforms.py:141-152).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.boxes import flat_box_mask, xyxy_to_cxcyhw

__all__ = [
    "normalize_imagenet",
    "destr_train_transform",
    "destr_eval_transform",
    "letterbox_infer_transform",
    "ssd_train_transform",
    "ssd_eval_transform",
]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_imagenet(images: jnp.ndarray) -> jnp.ndarray:
    """Scale [0, 255] uint8/float -> ImageNet-normalized float."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_STD, jnp.float32) * 255.0
    return (images.astype(jnp.float32) - mean) / std


def _resize_crop(image: jnp.ndarray, y0, x0, ch, cw, out_size: int) -> jnp.ndarray:
    """Resample the window [y0, y0+ch) x [x0, x0+cw) to (out_size, out_size).

    One fused ``scale_and_translate`` (crop + resize in a single gather):
    output pixel o maps to input y0 + o * ch / out_size.
    """
    scale = jnp.stack([out_size / ch, out_size / cw])
    translation = jnp.stack([-y0 * out_size / ch, -x0 * out_size / cw])
    return jax.image.scale_and_translate(
        image.astype(jnp.float32),
        (out_size, out_size, image.shape[-1]),
        (0, 1),
        scale,
        translation,
        method="linear",
    )


def _crop_boxes(boxes_xyxy, valid, y0, x0, ch, cw, h, w):
    """Re-express normalized xyxy boxes inside a pixel crop window; drop
    boxes that collapse (the reference's post-transform ``filter_flat_box``,
    dataset.py:52-55)."""
    px = boxes_xyxy * jnp.asarray([w, h, w, h], jnp.float32)
    shifted = px - jnp.stack([x0, y0, x0, y0])
    rescaled = shifted / jnp.stack([cw, ch, cw, ch])
    clipped = jnp.clip(rescaled, 0.0, 1.0)
    new_valid = valid & flat_box_mask(clipped)
    return clipped, new_valid


@partial(jax.jit, static_argnames=("out_size", "scale_range", "ratio_range"))
def destr_train_transform(
    images: jnp.ndarray,
    boxes_xyxy: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    rng: jax.Array,
    content_hw: jnp.ndarray = None,
    out_size: int = 640,
    scale_range: tuple = (0.08, 1.0),
    ratio_range: tuple = (3.0 / 4.0, 4.0 / 3.0),
):
    """Batched RandomResizedCrop + hflip + normalize.

    Args:
        images: (B, H, W, 3) uint8/float canvas (any fixed size).
        boxes_xyxy: (B, T, 4) normalized; labels: (B, T); valid: (B, T).
        content_hw: optional (B, 2) content-extent fractions from the
            letterbox loader. When given, the crop is sampled over the real
            content (area fraction of content area, offsets inside content)
            but may extend into the zero padding when the sampled aspect
            ratio doesn't fit the content aspect — the output then carries a
            "pixel_valid" (B, S, S) mask marking real pixels, which the model
            consumes as its image valid-mask (the reference's NestedTensor
            mask semantics, misc.py:26-45, finally exercised with real
            padding).

    Returns dict with "images" (B, S, S, 3) normalized float32 and
    transformed padded targets (+ "pixel_valid" in letterbox mode).
    """
    b, h, w, _ = images.shape
    letterboxed = content_hw is not None

    def one(image, boxes, vmask, key, content):
        hc, wc = content[0] * h, content[1] * w  # content extent, pixels
        k_area, k_ratio, k_y, k_x, k_flip = jax.random.split(key, 5)
        area_frac = jax.random.uniform(
            k_area, minval=scale_range[0], maxval=scale_range[1]
        )
        log_r = jax.random.uniform(
            k_ratio,
            minval=math.log(ratio_range[0]),
            maxval=math.log(ratio_range[1]),
        )
        ratio = jnp.exp(log_r)
        target_area = area_frac * hc * wc
        cw = jnp.clip(jnp.sqrt(target_area * ratio), 8.0, w)
        ch = jnp.clip(jnp.sqrt(target_area / ratio), 8.0, h)
        y0 = jax.random.uniform(k_y, minval=0.0, maxval=1.0) * jnp.maximum(hc - ch, 0.0)
        x0 = jax.random.uniform(k_x, minval=0.0, maxval=1.0) * jnp.maximum(wc - cw, 0.0)

        out = _resize_crop(image, y0, x0, ch, cw, out_size)
        new_boxes, new_valid = _crop_boxes(boxes, vmask, y0, x0, ch, cw, h, w)

        # output pixel (i, j) samples canvas position y0 + (i+.5)·ch/S; it is
        # real content iff that position is inside the content extent
        rows = y0 + (jnp.arange(out_size) + 0.5) * ch / out_size
        cols = x0 + (jnp.arange(out_size) + 0.5) * cw / out_size
        pvalid = (rows[:, None] < hc) & (cols[None, :] < wc)

        flip = jax.random.bernoulli(k_flip)
        out = jnp.where(flip, out[:, ::-1, :], out)
        pvalid = jnp.where(flip, pvalid[:, ::-1], pvalid)
        flipped = jnp.stack(
            [
                1.0 - new_boxes[..., 2],
                new_boxes[..., 1],
                1.0 - new_boxes[..., 0],
                new_boxes[..., 3],
            ],
            axis=-1,
        )
        new_boxes = jnp.where(flip, flipped, new_boxes)
        return out, new_boxes, new_valid, pvalid

    if content_hw is None:
        content_hw = jnp.ones((b, 2), jnp.float32)
    keys = jax.random.split(rng, b)
    out_images, out_boxes, out_valid, pixel_valid = jax.vmap(one)(
        images, boxes_xyxy, valid, keys, content_hw
    )
    result = {
        "images": normalize_imagenet(out_images),
        "boxes": out_boxes,
        "labels": labels,
        "valid": out_valid,
    }
    if letterboxed:
        result["pixel_valid"] = pixel_valid
    return result


@partial(jax.jit, static_argnames=("resize_to", "out_size"))
def destr_eval_transform(
    images: jnp.ndarray,
    boxes_xyxy: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    content_hw: jnp.ndarray = None,
    resize_to: int = 672,
    out_size: int = 640,
):
    """Resize shorter-side-to-``resize_to`` + center-crop ``out_size``
    (transforms.py:170-181).

    On a stretched square canvas this is a fixed central window of side
    ``out_size / resize_to`` of the canvas. With ``content_hw`` (letterbox
    loader) it is the *true* reference geometry: the reference's shorter-side
    resize + center crop is, in source coordinates, a centered square window
    of side ``out_size/resize_to * min(H, W)`` — here computed per image over
    the aspect-preserved content, so eval sees exactly the pixel distribution
    the reference evaluates on (no stretch). The window always lies inside
    the content, so no pixel mask is needed.
    """
    b, h, w, _ = images.shape

    def one(image, boxes, vmask, content):
        hc, wc = content[0] * h, content[1] * w
        side = jnp.minimum(hc, wc) * out_size / resize_to
        y0 = (hc - side) / 2.0
        x0 = (wc - side) / 2.0
        out = _resize_crop(image, y0, x0, side, side, out_size)
        new_boxes, new_valid = _crop_boxes(boxes, vmask, y0, x0, side, side, h, w)
        return out, new_boxes, new_valid

    if content_hw is None:
        content_hw = jnp.ones((b, 2), jnp.float32)
    out_images, out_boxes, out_valid = jax.vmap(one)(
        images, boxes_xyxy, valid, content_hw
    )
    return {
        "images": normalize_imagenet(out_images),
        "boxes": out_boxes,
        "labels": labels,
        "valid": out_valid,
    }


@partial(jax.jit, static_argnames=("out_size",))
def letterbox_infer_transform(
    images: jnp.ndarray,
    content_hw: jnp.ndarray,
    out_size: int = 640,
):
    """Whole-canvas resize + pixel validity mask, for serving/inference.

    Unlike the eval transform this crops nothing — the full letterboxed
    canvas (content + zero padding) is resampled to ``out_size`` and the
    content region is reported as a (B, S, S) bool mask for the model's
    image valid-mask input. Boxes predicted in output coordinates map back
    to the original image by dividing by the content fractions.
    """
    b, h, w, _ = images.shape

    def one(image, content):
        out = _resize_crop(image, 0.0, 0.0, float(h), float(w), out_size)
        frac = (jnp.arange(out_size) + 0.5) / out_size
        pvalid = (frac[:, None] < content[0]) & (frac[None, :] < content[1])
        return out, pvalid

    out_images, pixel_valid = jax.vmap(one)(images, content_hw)
    return {"images": normalize_imagenet(out_images), "pixel_valid": pixel_valid}


# SSD-paper min-IoU (here: min fraction of box centers retained) modes; the
# reference samples from {None, 0, .1, .3, .5, .7, .9} (transforms.py:78-82)
_SSD_MODES = (-1.0, 0.0, 0.1, 0.3, 0.5, 0.7, 0.9)


@partial(jax.jit, static_argnames=("out_size", "num_candidates"))
def ssd_train_transform(
    images: jnp.ndarray,
    boxes_xyxy: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    rng: jax.Array,
    out_size: int = 300,
    num_candidates: int = 8,
):
    """SSD random patch + resize + normalize; boxes returned cxcyhw.

    Per image: sample a retention mode; sample ``num_candidates`` crops
    (scale in [0.3, 1], ratio in [1/2, 2] like the SSD paper); a crop is
    admissible if the fraction of valid GT centers it contains is >= the
    mode. First admissible candidate wins, else identity. (Bounded-work
    replacement for transforms.py:83-118's unbounded retry loop.)
    """
    b, h, w, _ = images.shape

    def one(image, boxes, vmask, key):
        k_mode, k_dims, k_pos, k_flip = jax.random.split(key, 4)
        mode = jnp.asarray(_SSD_MODES)[
            jax.random.randint(k_mode, (), 0, len(_SSD_MODES))
        ]

        dims = jax.random.uniform(k_dims, (num_candidates, 2), minval=0.3, maxval=1.0)
        chs = dims[:, 0] * h
        cws = dims[:, 1] * w
        pos = jax.random.uniform(k_pos, (num_candidates, 2))
        y0s = pos[:, 0] * (h - chs)
        x0s = pos[:, 1] * (w - cws)

        centers = (boxes[:, :2] + boxes[:, 2:]) / 2.0  # normalized (T, 2) x,y
        cx = centers[:, 0] * w
        cy = centers[:, 1] * h
        inside = (
            (cx[None, :] >= x0s[:, None])
            & (cx[None, :] < (x0s + cws)[:, None])
            & (cy[None, :] >= y0s[:, None])
            & (cy[None, :] < (y0s + chs)[:, None])
            & vmask[None, :]
        )  # (K, T)
        n_valid = jnp.maximum(jnp.sum(vmask), 1)
        frac = jnp.sum(inside, axis=1) / n_valid  # (K,)
        admissible = frac >= jnp.maximum(mode, 0.0)

        identity_first = mode < 0.0  # mode "None": keep the full image
        pick = jnp.argmax(admissible)  # first admissible
        any_ok = jnp.any(admissible) & ~identity_first

        y0 = jnp.where(any_ok, y0s[pick], 0.0)
        x0 = jnp.where(any_ok, x0s[pick], 0.0)
        ch = jnp.where(any_ok, chs[pick], float(h))
        cw = jnp.where(any_ok, cws[pick], float(w))

        out = _resize_crop(image, y0, x0, ch, cw, out_size)
        new_boxes, new_valid = _crop_boxes(boxes, vmask, y0, x0, ch, cw, h, w)
        # the SSD crop also drops boxes whose center left the window
        kept_centers = jnp.where(any_ok, inside[pick], vmask)
        new_valid = new_valid & kept_centers

        flip = jax.random.bernoulli(k_flip)
        out = jnp.where(flip, out[:, ::-1, :], out)
        flipped = jnp.stack(
            [
                1.0 - new_boxes[..., 2],
                new_boxes[..., 1],
                1.0 - new_boxes[..., 0],
                new_boxes[..., 3],
            ],
            axis=-1,
        )
        new_boxes = jnp.where(flip, flipped, new_boxes)
        return out, new_boxes, new_valid

    keys = jax.random.split(rng, b)
    out_images, out_boxes, out_valid = jax.vmap(one)(images, boxes_xyxy, valid, keys)
    return {
        "images": normalize_imagenet(out_images),
        "boxes": xyxy_to_cxcyhw(out_boxes),  # SSD trains in cxcyhw (h, w)
        "labels": labels,
        "valid": out_valid,
    }


@partial(jax.jit, static_argnames=("out_size",))
def ssd_eval_transform(
    images: jnp.ndarray,
    boxes_xyxy: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    out_size: int = 300,
):
    """Resize + normalize; boxes to cxcyhw (transforms.py:141-152)."""
    b, h, w, _ = images.shape

    def one(image):
        return _resize_crop(image, 0.0, 0.0, float(h), float(w), out_size)

    out_images = jax.vmap(one)(images)
    return {
        "images": normalize_imagenet(out_images),
        "boxes": xyxy_to_cxcyhw(boxes_xyxy),
        "labels": labels,
        "valid": valid & flat_box_mask(boxes_xyxy),
    }
