"""RandAugment for video frames (reference ``lib/datasets/autoaugment.py``,
timm policy ``rand-m*-n*-mstd*``).

Operates on a list/array of uint8 RGB frames via PIL, applying the SAME
sampled ops to every frame of a clip (timm video semantics, as used by the
EPIC finetuning path, reference ``lib/datasets/epickitchens.py:149-162``).
"""

from __future__ import annotations

import re
from typing import List, Optional

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

_MAX_LEVEL = 10.0
_FILL = (124, 116, 104)


def _randomly_negate(v, rng):
    return -v if rng.uniform() > 0.5 else v


# each op: (pil_fn(img, magnitude), level_fn(level, rng))


def _rotate(img, deg):
    return img.rotate(deg, fillcolor=_FILL)


def _shear_x(img, f):
    return img.transform(img.size, Image.AFFINE, (1, f, 0, 0, 1, 0),
                         fillcolor=_FILL)


def _shear_y(img, f):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, f, 1, 0),
                         fillcolor=_FILL)


def _translate_x(img, pct):
    pixels = pct * img.size[0]
    return img.transform(img.size, Image.AFFINE, (1, 0, pixels, 0, 1, 0),
                         fillcolor=_FILL)


def _translate_y(img, pct):
    pixels = pct * img.size[1]
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, pixels),
                         fillcolor=_FILL)


def _level_30deg(level, rng):
    return _randomly_negate(level / _MAX_LEVEL * 30.0, rng)


def _level_09(level, rng):
    return 1.0 + _randomly_negate(level / _MAX_LEVEL * 0.9, rng)


def _level_shear(level, rng):
    return _randomly_negate(level / _MAX_LEVEL * 0.3, rng)


def _level_translate(level, rng):
    return _randomly_negate(level / _MAX_LEVEL * 0.45, rng)


_OPS = {
    "AutoContrast": (lambda img, _: ImageOps.autocontrast(img), None),
    "Equalize": (lambda img, _: ImageOps.equalize(img), None),
    "Invert": (lambda img, _: ImageOps.invert(img), None),
    "Rotate": (_rotate, _level_30deg),
    "Posterize": (
        lambda img, bits: ImageOps.posterize(img, int(bits)),
        # timm 'rand' policy: 4..8 bits
        lambda level, rng: 4 + int((level / _MAX_LEVEL) * 4),
    ),
    "Solarize": (
        lambda img, t: ImageOps.solarize(img, int(t)),
        lambda level, rng: int((level / _MAX_LEVEL) * 256),
    ),
    "Color": (lambda img, f: ImageEnhance.Color(img).enhance(f), _level_09),
    "Contrast": (lambda img, f: ImageEnhance.Contrast(img).enhance(f), _level_09),
    "Brightness": (lambda img, f: ImageEnhance.Brightness(img).enhance(f), _level_09),
    "Sharpness": (lambda img, f: ImageEnhance.Sharpness(img).enhance(f), _level_09),
    "ShearX": (_shear_x, _level_shear),
    "ShearY": (_shear_y, _level_shear),
    "TranslateX": (_translate_x, _level_translate),
    "TranslateY": (_translate_y, _level_translate),
}


class RandAugment:
    """``rand-mN-nK-mstdS`` policy applied clip-consistently."""

    def __init__(self, magnitude: int = 9, num_layers: int = 2,
                 magnitude_std: float = 0.5):
        self.magnitude = magnitude
        self.num_layers = num_layers
        self.magnitude_std = magnitude_std
        self.op_names = list(_OPS)

    @classmethod
    def from_config_str(cls, config: str) -> "RandAugment":
        """Parse timm-style 'rand-m9-n2-mstd0.5'."""
        m, n, mstd = 9, 2, 0.5
        for part in config.split("-")[1:]:
            if part.startswith("mstd"):
                mstd = float(part[4:])
            elif part.startswith("m"):
                m = int(part[1:])
            elif part.startswith("n"):
                n = int(part[1:])
        return cls(m, n, mstd)

    def __call__(self, frames: np.ndarray,
                 rng: Optional[np.random.RandomState] = None) -> np.ndarray:
        """frames: [T, H, W, C] uint8 -> same, augmented."""
        rng = rng or np.random
        chosen = [self.op_names[i] for i in
                  rng.randint(0, len(self.op_names), self.num_layers)]
        plans = []
        for name in chosen:
            fn, level_fn = _OPS[name]
            mag = self.magnitude
            if self.magnitude_std > 0:
                mag = min(_MAX_LEVEL, max(0, rng.normal(mag, self.magnitude_std)))
            plans.append((fn, level_fn(mag, rng) if level_fn else None))
        out = []
        for frame in frames:
            img = Image.fromarray(frame)
            for fn, arg in plans:
                img = fn(img, arg)
            out.append(np.asarray(img))
        return np.stack(out)
