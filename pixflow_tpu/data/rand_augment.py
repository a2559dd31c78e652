"""Compact RandAugment (PIL), powering the 'RandAug' recipe.

Functional equivalent of the timm-derived vendored implementation the
reference carries (`contrast/data/rand_augment.py`, only used by its
'RandAug' recipe): n ops drawn per image from the standard RandAugment op
set, magnitude ~ N(m, mstd) clipped to [0, 10]."""

from __future__ import annotations

import random

from PIL import Image, ImageEnhance, ImageOps

_MAX_LEVEL = 10.0
_FILL = (124, 116, 104)  # ImageNet mean fill


def _shear_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0),
                         fillcolor=_FILL)


def _shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0),
                         fillcolor=_FILL)


def _translate_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, v * img.size[0], 0, 1, 0),
                         fillcolor=_FILL)


def _translate_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v * img.size[1]),
                         fillcolor=_FILL)


def _rotate(img, v):
    return img.rotate(v, fillcolor=_FILL)


def _level_to_arg(level, max_val, signed=True, rng=random):
    v = level / _MAX_LEVEL * max_val
    if signed and rng.random() > 0.5:
        v = -v
    return v


OPS = [
    ("AutoContrast", lambda im, lv, rng: ImageOps.autocontrast(im)),
    ("Equalize", lambda im, lv, rng: ImageOps.equalize(im)),
    ("Invert", lambda im, lv, rng: ImageOps.invert(im)),
    ("Rotate", lambda im, lv, rng: _rotate(im, _level_to_arg(lv, 30, rng=rng))),
    ("Posterize", lambda im, lv, rng: ImageOps.posterize(
        im, max(1, int(8 - lv / _MAX_LEVEL * 4)))),
    ("Solarize", lambda im, lv, rng: ImageOps.solarize(
        im, int(256 - lv / _MAX_LEVEL * 256))),
    ("Color", lambda im, lv, rng: ImageEnhance.Color(im).enhance(
        1.0 + _level_to_arg(lv, 0.9, rng=rng))),
    ("Contrast", lambda im, lv, rng: ImageEnhance.Contrast(im).enhance(
        1.0 + _level_to_arg(lv, 0.9, rng=rng))),
    ("Brightness", lambda im, lv, rng: ImageEnhance.Brightness(im).enhance(
        1.0 + _level_to_arg(lv, 0.9, rng=rng))),
    ("Sharpness", lambda im, lv, rng: ImageEnhance.Sharpness(im).enhance(
        1.0 + _level_to_arg(lv, 0.9, rng=rng))),
    ("ShearX", lambda im, lv, rng: _shear_x(im, _level_to_arg(lv, 0.3, rng=rng))),
    ("ShearY", lambda im, lv, rng: _shear_y(im, _level_to_arg(lv, 0.3, rng=rng))),
    ("TranslateX", lambda im, lv, rng: _translate_x(im, _level_to_arg(lv, 0.45, rng=rng))),
    ("TranslateY", lambda im, lv, rng: _translate_y(im, _level_to_arg(lv, 0.45, rng=rng))),
]


class RandAugment:
    def __init__(self, n: int = 2, magnitude: float = 10,
                 magnitude_std: float = 0.5):
        self.n = n
        self.magnitude = magnitude
        self.magnitude_std = magnitude_std

    def __call__(self, img: Image.Image, rng=random) -> Image.Image:
        for _ in range(self.n):
            name, fn = OPS[rng.randrange(len(OPS))]
            level = rng.gauss(self.magnitude, self.magnitude_std)
            level = min(max(level, 0.0), _MAX_LEVEL)
            img = fn(img, level, rng)
        return img
