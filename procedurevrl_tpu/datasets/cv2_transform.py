"""Box-aware list-of-frames transforms for detection-style datasets
(reference ``lib/datasets/cv2_transform.py:8-796``, the AVA preprocessing
library).

Numpy/cv2 host-side ops with the reference's exact math (short-side scale
with ``floor`` rounding, box rescale/flip/crop arithmetic, AlexNet PCA
lighting with BGR-indexed eigen sum, channel-mean contrast).  Two
deviations by design:

- every random op takes an optional ``rng`` (``np.random.RandomState``) so
  augmentation is seedable per sample (the epoch-folded RNG contract the
  rest of the data pipeline uses); default falls back to global
  ``np.random`` like the reference;
- ops are non-mutating (the reference edits boxes/images in place).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _rng(rng):
    return np.random if rng is None else rng


def _resize(image: np.ndarray, new_width: int, new_height: int) -> np.ndarray:
    import cv2

    return cv2.resize(
        image, (new_width, new_height), interpolation=cv2.INTER_LINEAR
    ).astype(np.float32)


def clip_boxes_to_image(boxes: np.ndarray, height: int, width: int) -> np.ndarray:
    """Clip box coordinates into [0, size-1] (reference :8-25)."""
    boxes = boxes.copy()
    boxes[:, [0, 2]] = np.minimum(width - 1.0, np.maximum(0.0, boxes[:, [0, 2]]))
    boxes[:, [1, 3]] = np.minimum(height - 1.0, np.maximum(0.0, boxes[:, [1, 3]]))
    return boxes


def _short_side_dims(height: int, width: int, size: int) -> Optional[Tuple[int, int]]:
    """(new_height, new_width) for short-side==size, or None if no-op."""
    if (width <= height and width == size) or (height <= width and height == size):
        return None
    if width < height:
        return int(math.floor((float(height) / width) * size)), size
    return size, int(math.floor((float(width) / height) * size))


def scale(size: int, image: np.ndarray) -> np.ndarray:
    """Short side -> ``size`` with bilinear resize (reference :76-103)."""
    dims = _short_side_dims(image.shape[0], image.shape[1], size)
    if dims is None:
        return image
    return _resize(image, dims[1], dims[0])


def scale_boxes(size: int, boxes: np.ndarray, height: int, width: int) -> np.ndarray:
    """Rescale boxes by the same short-side factor (reference :105-131)."""
    dims = _short_side_dims(height, width, size)
    if dims is None:
        return boxes
    if width < height:
        return boxes * (float(dims[0]) / height)
    return boxes * (float(dims[1]) / width)


def random_short_side_scale_jitter_list(
    images: List[np.ndarray], min_size: int, max_size: int, boxes=None, rng=None
):
    """Inverse-uniform short-side jitter of HWC frames + boxes
    (reference :28-74)."""
    size = int(round(1.0 / _rng(rng).uniform(1.0 / max_size, 1.0 / min_size)))
    height, width = images[0].shape[0], images[0].shape[1]
    dims = _short_side_dims(height, width, size)
    if dims is None:
        return images, boxes
    new_height, new_width = dims
    if boxes is not None:
        factor = (float(new_height) / height if width < height
                  else float(new_width) / width)
        boxes = [proposal * factor for proposal in boxes]
    return [_resize(img, new_width, new_height) for img in images], boxes


def flip_boxes(boxes: np.ndarray, im_width: int) -> np.ndarray:
    """x -> W - x - 1 mirror of [x1, y1, x2, y2] boxes (reference :364-377)."""
    flipped = boxes.copy()
    flipped[:, 0::4] = im_width - boxes[:, 2::4] - 1
    flipped[:, 2::4] = im_width - boxes[:, 0::4] - 1
    return flipped


def crop_boxes(boxes: np.ndarray, x_offset: int, y_offset: int) -> np.ndarray:
    """Shift boxes by crop offsets (reference :380-390)."""
    boxes = boxes.copy()
    boxes[:, [0, 2]] -= x_offset
    boxes[:, [1, 3]] -= y_offset
    return boxes


def horizontal_flip(prob: float, image: np.ndarray, order="CHW", rng=None):
    """reference :343-361."""
    assert order in ("CHW", "HWC"), f"order {order} is not supported"
    if _rng(rng).uniform() < prob:
        image = image[:, :, ::-1] if order == "CHW" else image[:, ::-1, :]
    return image


def horizontal_flip_list(prob: float, images: List[np.ndarray], order="CHW",
                         boxes=None, rng=None):
    """reference :133-162."""
    width = images[0].shape[2] if order == "CHW" else images[0].shape[1]
    if _rng(rng).uniform() < prob:
        if boxes is not None:
            boxes = [flip_boxes(proposal, width) for proposal in boxes]
        if order == "CHW":
            return [img[:, :, ::-1].copy() for img in images], boxes
        return [img[:, ::-1, :].copy() for img in images], boxes
    return images, boxes


def spatial_shift_crop_list(size: int, images: List[np.ndarray],
                            spatial_shift_pos: int, boxes=None):
    """Left/center/right (or top/center/bottom) crop of HWC frames + boxes
    (reference :165-212)."""
    assert spatial_shift_pos in (0, 1, 2)
    height, width = images[0].shape[0], images[0].shape[1]
    y_offset = int(math.ceil((height - size) / 2))
    x_offset = int(math.ceil((width - size) / 2))
    if height > width:
        if spatial_shift_pos == 0:
            y_offset = 0
        elif spatial_shift_pos == 2:
            y_offset = height - size
    else:
        if spatial_shift_pos == 0:
            x_offset = 0
        elif spatial_shift_pos == 2:
            x_offset = width - size
    cropped = [
        img[y_offset:y_offset + size, x_offset:x_offset + size, :]
        for img in images
    ]
    assert cropped[0].shape[0] == size and cropped[0].shape[1] == size
    if boxes is not None:
        boxes = [crop_boxes(b, x_offset, y_offset) for b in boxes]
    return cropped, boxes


def CHW2HWC(image: np.ndarray) -> np.ndarray:
    return image.transpose([1, 2, 0])


def HWC2CHW(image: np.ndarray) -> np.ndarray:
    return image.transpose([2, 0, 1])


def pad_image(image: np.ndarray, pad_size: int, order="CHW") -> np.ndarray:
    """Zero-pad spatial dims (reference :318-340)."""
    if order == "CHW":
        return np.pad(image, ((0, 0), (pad_size, pad_size),
                              (pad_size, pad_size)), mode="constant")
    return np.pad(image, ((pad_size, pad_size), (pad_size, pad_size),
                          (0, 0)), mode="constant")


def random_crop_list(images: List[np.ndarray], size: int, pad_size: int = 0,
                     order="CHW", boxes=None, rng=None):
    """Shared random crop across the list (reference :393-454)."""
    if pad_size > 0:
        images = [pad_image(img, pad_size, order) for img in images]
    hw = (images[0].shape[1:3] if order == "CHW" else images[0].shape[0:2])
    height, width = hw
    if height == size and width == size:
        return images, boxes
    y_offset = int(_rng(rng).randint(0, height - size)) if height > size else 0
    x_offset = int(_rng(rng).randint(0, width - size)) if width > size else 0
    if order == "CHW":
        cropped = [img[:, y_offset:y_offset + size, x_offset:x_offset + size]
                   for img in images]
    else:
        cropped = [img[y_offset:y_offset + size, x_offset:x_offset + size, :]
                   for img in images]
    if boxes is not None:
        boxes = [crop_boxes(b, x_offset, y_offset) for b in boxes]
    return cropped, boxes


def center_crop(size: int, image: np.ndarray) -> np.ndarray:
    """HWC center crop (reference :457-474)."""
    height, width = image.shape[0], image.shape[1]
    y_offset = int(math.ceil((height - size) / 2))
    x_offset = int(math.ceil((width - size) / 2))
    cropped = image[y_offset:y_offset + size, x_offset:x_offset + size, :]
    assert cropped.shape[0] == size and cropped.shape[1] == size
    return cropped


def color_normalization(image: np.ndarray, mean, stddev) -> np.ndarray:
    """Per-channel (x - mean) / std, CHW (reference :301-315)."""
    assert len(mean) == image.shape[0], "channel mean not computed properly"
    assert len(stddev) == image.shape[0], "channel stddev not computed properly"
    out = image.astype(np.float32, copy=True)
    for idx in range(image.shape[0]):
        out[idx] = (out[idx] - mean[idx]) / stddev[idx]
    return out


# ---------------------------------------------------------------------------
# photometric ops (CHW, BGR channel order as in the reference's cv2 pipeline)
# ---------------------------------------------------------------------------


def blend(image1: np.ndarray, image2: np.ndarray, alpha: float) -> np.ndarray:
    """reference :631-632."""
    return image1 * alpha + image2 * (1 - alpha)


def grayscale(image: np.ndarray) -> np.ndarray:
    """BGR CHW -> replicated luminance (R=ch2, G=ch1, B=ch0;
    reference :635-650)."""
    gray = 0.299 * image[2] + 0.587 * image[1] + 0.114 * image[0]
    return np.broadcast_to(gray, image.shape).astype(image.dtype).copy()


def saturation(var: float, image: np.ndarray, rng=None) -> np.ndarray:
    """reference :653-664."""
    alpha = 1.0 + _rng(rng).uniform(-var, var)
    return blend(image, grayscale(image), alpha)


def brightness(var: float, image: np.ndarray, rng=None) -> np.ndarray:
    """reference :667-678."""
    alpha = 1.0 + _rng(rng).uniform(-var, var)
    return blend(image, np.zeros_like(image), alpha)


def contrast(var: float, image: np.ndarray, rng=None) -> np.ndarray:
    """Blend toward the mean of the gray channel (reference :681-693)."""
    gray = grayscale(image)
    gray = np.full_like(gray, np.mean(gray[0]))
    alpha = 1.0 + _rng(rng).uniform(-var, var)
    return blend(image, gray, alpha)


def _shared_alpha_list(var, images, base_fn, rng):
    """The *_list ops draw ONE alpha for the whole clip
    (reference :696-748)."""
    alpha = 1.0 + _rng(rng).uniform(-var, var)
    out = []
    for img in images:
        if base_fn == "brightness":
            out.append(blend(img, np.zeros_like(img), alpha))
        elif base_fn == "saturation":
            out.append(blend(img, grayscale(img), alpha))
        else:  # contrast
            gray = grayscale(img)
            gray = np.full_like(gray, np.mean(gray[0]))
            out.append(blend(img, gray, alpha))
    return out


def brightness_list(var, images, rng=None):
    return _shared_alpha_list(var, images, "brightness", rng)


def saturation_list(var, images, rng=None):
    return _shared_alpha_list(var, images, "saturation", rng)


def contrast_list(var, images, rng=None):
    return _shared_alpha_list(var, images, "contrast", rng)


def color_jitter(image, img_brightness=0, img_contrast=0, img_saturation=0,
                 rng=None):
    """Random-order jitter chain on one image (reference :751-779)."""
    jitter = []
    if img_brightness != 0:
        jitter.append("brightness")
    if img_contrast != 0:
        jitter.append("contrast")
    if img_saturation != 0:
        jitter.append("saturation")
    if jitter:
        order = _rng(rng).permutation(np.arange(len(jitter)))
        for idx in range(len(jitter)):
            kind = jitter[order[idx]]
            if kind == "brightness":
                image = brightness(img_brightness, image, rng)
            elif kind == "contrast":
                image = contrast(img_contrast, image, rng)
            else:
                image = saturation(img_saturation, image, rng)
    return image


def color_jitter_list(images, img_brightness=0, img_contrast=0,
                      img_saturation=0, rng=None):
    """Random-order jitter chain shared across the clip (reference :239-269)."""
    jitter = []
    if img_brightness != 0:
        jitter.append("brightness")
    if img_contrast != 0:
        jitter.append("contrast")
    if img_saturation != 0:
        jitter.append("saturation")
    if jitter:
        order = _rng(rng).permutation(np.arange(len(jitter)))
        for idx in range(len(jitter)):
            kind = jitter[order[idx]]
            if kind == "brightness":
                images = brightness_list(img_brightness, images, rng)
            elif kind == "contrast":
                images = contrast_list(img_contrast, images, rng)
            else:
                images = saturation_list(img_saturation, images, rng)
    return images


def lighting_list(imgs, alphastd, eigval, eigvec, alpha=None, rng=None):
    """AlexNet PCA lighting, CHW BGR: channel idx adds rgb[2 - idx]
    (reference :272-298)."""
    if alphastd == 0:
        return imgs
    if alpha is None:
        alpha = _rng(rng).normal(0, alphastd, size=(1, 3))
    eig_vec = np.array(eigvec)
    eig_val = np.reshape(eigval, (1, 3))
    rgb = np.sum(
        eig_vec * np.repeat(alpha, 3, axis=0) * np.repeat(eig_val, 3, axis=0),
        axis=1,
    )
    out = []
    for img in imgs:
        img = img.astype(np.float32, copy=True)
        for idx in range(img.shape[0]):
            img[idx] = img[idx] + rgb[2 - idx]
        out.append(img)
    return out


def lighting(img, alphastd, eigval, eigvec, rng=None):
    """Single-image PCA lighting (reference :555-578)."""
    return lighting_list([img], alphastd, eigval, eigvec, rng=rng)[0]


def random_scale_jitter(image, min_size, max_size, rng=None):
    """Uniform short-side jitter of one image (reference :476-492)."""
    size = int(round(_rng(rng).uniform(min_size, max_size)))
    return scale(size, image)


def random_scale_jitter_list(images, min_size, max_size, rng=None):
    """Shared uniform short-side jitter over the list (reference :494-510)."""
    size = int(round(_rng(rng).uniform(min_size, max_size)))
    return [scale(size, img) for img in images]


def random_sized_crop(image, size, area_frac=0.08, rng=None):
    """Inception-style area crop with 10 attempts then fallback scale+center
    (reference :512-553)."""
    r = _rng(rng)
    for _ in range(10):
        height, width = image.shape[0], image.shape[1]
        area = height * width
        target_area = r.uniform(area_frac, 1.0) * area
        aspect_ratio = r.uniform(3.0 / 4.0, 4.0 / 3.0)
        w = int(round(math.sqrt(float(target_area) * aspect_ratio)))
        h = int(round(math.sqrt(float(target_area) / aspect_ratio)))
        if r.uniform() < 0.5:
            w, h = h, w
        if h <= height and w <= width:
            y = 0 if h == height else r.randint(0, height - h)
            x = 0 if w == width else r.randint(0, width - w)
            cropped = image[y:y + h, x:x + w, :]
            return _resize(cropped, size, size)
    return center_crop(size, scale(size, image))


def random_sized_crop_list(images, size, crop_area_fraction=0.08, rng=None):
    """Shared Inception-style crop geometry over the list (reference
    :581-628)."""
    r = _rng(rng)
    for _ in range(10):
        height, width = images[0].shape[0], images[0].shape[1]
        area = height * width
        target_area = r.uniform(crop_area_fraction, 1.0) * area
        aspect_ratio = r.uniform(3.0 / 4.0, 4.0 / 3.0)
        w = int(round(math.sqrt(float(target_area) * aspect_ratio)))
        h = int(round(math.sqrt(float(target_area) / aspect_ratio)))
        if r.uniform() < 0.5:
            w, h = h, w
        if h <= height and w <= width:
            y = 0 if h == height else r.randint(0, height - h)
            x = 0 if w == width else r.randint(0, width - w)
            return [_resize(img[y:y + h, x:x + w, :], size, size)
                    for img in images]
    return [center_crop(size, scale(size, img)) for img in images]


def revert_scaled_boxes(size, boxes, img_height, img_width):
    """Map boxes from the scaled image back to original coordinates
    (reference :782-796)."""
    scaled_aspect = np.min([img_height, img_width]) / float(size)
    return boxes * scaled_aspect
