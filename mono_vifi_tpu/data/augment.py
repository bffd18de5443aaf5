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


try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

_LUMA = np.array([0.299, 0.587, 0.114], np.float32)  # PIL "L" weights


def _fast_hue_rgb(arr_u8: np.ndarray, hue_factor: float) -> np.ndarray:
    """uint8 RGB hue shift via cv2's SIMD HSV roundtrip (~10x PIL).

    Matches the PIL/torchvision path's 0-255 H convention (HSV_FULL); the
    two HSV quantizations differ by a few /255 on a minority of pixels —
    an augmentation-level deviation only (see ColorJitter docstring)."""
    hsv = cv2.cvtColor(arr_u8, cv2.COLOR_RGB2HSV_FULL)
    h = hsv[..., 0].astype(np.int16)
    hsv[..., 0] = ((h + int(round(hue_factor * 255.0))) % 256).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB_FULL)


class ColorJitter:
    """One sampled jitter, applicable to many frames (shared augmentation).

    `fast` (default): brightness/contrast/saturation evaluated as vectorized
    float ops with ONE final uint8 rounding, hue via cv2's HSV roundtrip —
    ~4x faster per image, which matters because the host pipeline applies
    this to up to 4 frames per sample (tools/bench_loader.py). Deviation vs
    the exact PIL path (torchvision semantics): <=2/255 from deferred
    rounding plus small hue-quantization differences — noise relative to the
    jitter itself; the factors and their order are drawn identically, so
    augmentation STATISTICS are unchanged. `fast=False` restores the exact
    torchvision/PIL pipeline (reference datasets/mono_dataset.py:75-85)."""

    def __init__(
        self,
        brightness=(0.8, 1.2),
        contrast=(0.8, 1.2),
        saturation=(0.8, 1.2),
        hue=(-0.1, 0.1),
        rng: random.Random | None = None,
        fast: bool = True,
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
        self.fast = fast and cv2 is not None

    def _call_fast(self, img: Image.Image) -> Image.Image:
        arr = np.asarray(img, np.float32)
        for i in self.order:
            if i == 0:  # brightness: blend toward black
                arr = arr * self.brightness
            elif i == 1:  # contrast: blend toward the mean gray
                gray = arr @ _LUMA
                m = float(np.mean(gray))
                arr = arr * self.contrast + (1.0 - self.contrast) * m
            elif i == 2:  # saturation: blend toward per-pixel gray
                gray = (arr @ _LUMA)[..., None]
                arr = arr * self.saturation + (1.0 - self.saturation) * gray
            else:  # hue: integer HSV roundtrip on the current uint8 image
                if abs(self.hue) < 1e-9:  # identity (PIL path skips too)
                    continue
                u8 = np.clip(arr + 0.5, 0, 255).astype(np.uint8)
                arr = _fast_hue_rgb(u8, self.hue).astype(np.float32)
                continue
            # PIL blend() saturates to uint8 range after EVERY op — clip in
            # float so extrapolating factors (>1) match its behavior
            arr = np.clip(arr, 0.0, 255.0)
        return Image.fromarray(np.clip(arr + 0.5, 0, 255).astype(np.uint8))

    def __call__(self, img: Image.Image) -> Image.Image:
        if self.fast:
            return self._call_fast(img)
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


def to_u8(img: Image.Image) -> np.ndarray:
    """PIL -> uint8 HWC. The /255 float conversion moves to the DEVICE
    (training.monovifi.dequantize_batch): uint8 staging quarters host
    convert/collate bytes and host->device transfer; f32(u8)/255 on device
    equals to_array exactly (both are IEEE f32 divisions of exact values)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr
