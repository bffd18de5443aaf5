"""Host-side photometric augmentation: torchvision-ColorJitter-equivalent
brightness/contrast/saturation/hue jitter on PIL images.

The reference uses torchvision.transforms.ColorJitter with ranges
brightness/contrast/saturation (0.8, 1.2) and hue (-0.1, 0.1)
(datasets/mono_dataset.py:75-85, :254-258): factors drawn uniformly, the four
ops applied in a random order, the same jitter shared by every frame of one
sample.
"""

from __future__ import annotations

import random

import numpy as np
from PIL import Image, ImageEnhance


def _adjust_hue(img: Image.Image, hue_factor: float) -> Image.Image:
    """Shift hue by hue_factor (in [-0.5, 0.5] turns), torchvision semantics."""
    if abs(hue_factor) < 1e-9:
        return img
    h, s, v = img.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    np_h = (np_h.astype(np.int16) + int(round(hue_factor * 255.0))) % 256
    h = Image.fromarray(np_h.astype(np.uint8), "L")
    return Image.merge("HSV", (h, s, v)).convert("RGB")


class ColorJitter:
    """One sampled jitter, applicable to many frames (shared augmentation)."""

    def __init__(
        self,
        brightness=(0.8, 1.2),
        contrast=(0.8, 1.2),
        saturation=(0.8, 1.2),
        hue=(-0.1, 0.1),
        rng: random.Random | None = None,
    ):
        r = rng or random
        self.brightness = r.uniform(*brightness)
        self.contrast = r.uniform(*contrast)
        self.saturation = r.uniform(*saturation)
        self.hue = r.uniform(*hue)
        ops = [
            lambda im: ImageEnhance.Brightness(im).enhance(self.brightness),
            lambda im: ImageEnhance.Contrast(im).enhance(self.contrast),
            lambda im: ImageEnhance.Color(im).enhance(self.saturation),
            lambda im: _adjust_hue(im, self.hue),
        ]
        self.order = list(range(4))
        r.shuffle(self.order)
        self.ops = ops

    def __call__(self, img: Image.Image) -> Image.Image:
        for i in self.order:
            img = self.ops[i](img)
        return img


class Identity:
    def __call__(self, img):
        return img


def to_array(img: Image.Image) -> np.ndarray:
    """PIL -> float32 HWC in [0, 1] (ToTensor equivalent, NHWC layout)."""
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr
