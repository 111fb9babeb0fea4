"""Host-side image + caption transforms (cv2/NumPy).

From-scratch equivalents of the reference's albumentations pipeline
(reference: data/transforms.py + factories.py:103-148): square crops,
smallest-edge resize, color jitter, caption-aware horizontal flip
(left<->right word swap, transforms.py:156-181), caption normalization
(pre_caption, :61-90), tokenization, truncation.

Design differences from the reference:
  * transforms take an explicit ``np.random.Generator`` — the pipeline is
    reproducible per (seed, epoch, index) instead of relying on global
    process RNG state;
  * output images stay HWC uint8 until ``Normalize``, which emits fp32 —
    and the pipeline can defer Normalize to the device (the fused Pallas
    augmentation path) by dropping it from the list;
  * everything is shape-static at the exit: images are CROP x CROP x 3.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Any, Callable, Dict, List, Optional, Sequence

import cv2
import numpy as np

IMAGENET_COLOR_MEAN = (0.485, 0.456, 0.406)
IMAGENET_COLOR_STD = (0.229, 0.224, 0.225)


class Transform:
    """Base: transforms map a sample dict (image/caption keys) to a new
    dict, consuming randomness from an explicit generator."""

    p: float = 1.0

    def __call__(self, sample: Dict[str, Any],
                 rng: np.random.Generator) -> Dict[str, Any]:
        if self.p >= 1.0 or rng.random() < self.p:
            return self.apply(sample, rng)
        return sample

    def apply(self, sample, rng):
        raise NotImplementedError


class Compose:
    def __init__(self, transforms: Sequence[Transform]):
        self.transforms = list(transforms)

    def __call__(self, rng: np.random.Generator = None, **sample):
        if rng is None:
            rng = np.random.default_rng()
        for t in self.transforms:
            sample = t(sample, rng)
        return sample


# ---------------------------------------------------------------------------
# Caption transforms
# ---------------------------------------------------------------------------

def pre_caption(caption: str, max_words: int = 30) -> str:
    """Caption cleanup (reference: data/transforms.py:61-82 and
    data/dataloader.py:1027-1052): strip punctuation, collapse spaces,
    truncate to max_words."""
    caption = re.sub(r"([,.'!?\"()*#:;~])", "", caption.lower())
    caption = caption.replace("-", " ").replace("/", " ").replace(
        "<person>", "person")
    caption = re.sub(r"\s{2,}", " ", caption).rstrip("\n").strip(" ")
    words = caption.split(" ")
    if len(words) > max_words:
        caption = " ".join(words[:max_words])
    return caption


class NormalizeCaption(Transform):
    """Lowercase, strip punctuation/accents, NFKD normalize
    (reference: data/transforms.py:46-90)."""

    def __init__(self, max_caption_length: int = 30):
        self.max_caption_length = max_caption_length

    def apply(self, sample, rng):
        caption = pre_caption(sample["caption"], self.max_caption_length)
        caption = unicodedata.normalize("NFKD", caption.lower())
        caption = "".join(c for c in caption if not unicodedata.combining(c))
        return {**sample, "caption": caption}


class TokenizeCaption(Transform):
    """str -> List[int] with <start>/<eos> boundaries
    (reference: data/transforms.py:93-125)."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer

    def apply(self, sample, rng):
        ids = self.tokenizer.encode(sample["caption"])
        ids.insert(0, self.tokenizer.token_to_id("<start>"))
        ids.append(self.tokenizer.token_to_id("<eos>"))
        return {**sample, "caption": ids}


class TruncateCaptionTokens(Transform):
    def __init__(self, max_caption_length: int = 30):
        self.max_caption_length = max_caption_length

    def apply(self, sample, rng):
        return {**sample, "caption": sample["caption"][: self.max_caption_length]}


# ---------------------------------------------------------------------------
# Image transforms
# ---------------------------------------------------------------------------

class HorizontalFlip(Transform):
    """Flip image; swap 'left'<->'right' in the caption
    (reference: data/transforms.py:156-181)."""

    def __init__(self, p: float = 0.5):
        self.p = p

    def apply(self, sample, rng):
        out = dict(sample)
        out["image"] = np.ascontiguousarray(sample["image"][:, ::-1])
        if "caption" in sample and isinstance(sample["caption"], str):
            out["caption"] = (sample["caption"]
                              .replace("left", "[TMP]")
                              .replace("right", "left")
                              .replace("[TMP]", "right"))
        return out


class RandomResizedSquareCrop(Transform):
    """Random area/aspect crop resized to a square
    (reference: data/transforms.py:184-195 via albumentations)."""

    def __init__(self, size: int, scale=(0.2, 1.0), ratio=(0.75, 4 / 3),
                 p: float = 1.0):
        self.size = size
        self.scale = scale
        self.ratio = ratio
        self.p = p

    def apply(self, sample, rng):
        img = sample["image"]
        h, w = img.shape[:2]
        area = h * w
        for _ in range(10):
            target_area = rng.uniform(*self.scale) * area
            log_ratio = (np.log(self.ratio[0]), np.log(self.ratio[1]))
            aspect = np.exp(rng.uniform(*log_ratio))
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                x0 = rng.integers(0, w - cw + 1)
                y0 = rng.integers(0, h - ch + 1)
                crop = img[y0:y0 + ch, x0:x0 + cw]
                out = cv2.resize(crop, (self.size, self.size),
                                 interpolation=cv2.INTER_LINEAR)
                return {**sample, "image": out}
        # Fallback: center crop of the maximal valid square.
        s = min(h, w)
        y0, x0 = (h - s) // 2, (w - s) // 2
        crop = img[y0:y0 + s, x0:x0 + s]
        out = cv2.resize(crop, (self.size, self.size),
                         interpolation=cv2.INTER_LINEAR)
        return {**sample, "image": out}


class CenterSquareCrop(Transform):
    def __init__(self, size: int, p: float = 1.0):
        self.size = size
        self.p = p

    def apply(self, sample, rng):
        img = sample["image"]
        h, w = img.shape[:2]
        s = self.size
        if h < s or w < s:  # upscale first if needed
            scale = s / min(h, w)
            img = cv2.resize(img, (max(s, int(round(w * scale))),
                                   max(s, int(round(h * scale)))),
                             interpolation=cv2.INTER_LINEAR)
            h, w = img.shape[:2]
        y0, x0 = (h - s) // 2, (w - s) // 2
        return {**sample, "image": img[y0:y0 + s, x0:x0 + s]}


class SmallestMaxSize(Transform):
    """Resize so the smallest edge equals ``size``."""

    def __init__(self, size: int = 256, p: float = 1.0):
        self.size = size
        self.p = p

    def apply(self, sample, rng):
        img = sample["image"]
        h, w = img.shape[:2]
        scale = self.size / min(h, w)
        out = cv2.resize(img, (int(round(w * scale)), int(round(h * scale))),
                         interpolation=cv2.INTER_LINEAR)
        return {**sample, "image": out}


class SquareResize(Transform):
    def __init__(self, size: int, p: float = 1.0):
        self.size = size
        self.p = p

    def apply(self, sample, rng):
        out = cv2.resize(sample["image"], (self.size, self.size),
                         interpolation=cv2.INTER_LINEAR)
        return {**sample, "image": out}


class ColorJitter(Transform):
    """Brightness/contrast/saturation/hue jitter in uint8 space.

    Same knobs as the reference's albumentations ColorJitter
    (factories.py:132-137: 0.4/0.4/0.4/0.1 at p=0.8; hue kept small
    because captions mention colors)."""

    def __init__(self, brightness=0.4, contrast=0.4, saturation=0.4,
                 hue=0.1, p: float = 0.8):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.p = p

    def apply(self, sample, rng):
        img = sample["image"].astype(np.float32)
        # brightness / contrast / saturation as multiplicative factors
        if self.brightness:
            img = img * rng.uniform(1 - self.brightness, 1 + self.brightness)
        if self.contrast:
            mean = img.mean()
            img = (img - mean) * rng.uniform(
                1 - self.contrast, 1 + self.contrast) + mean
        if self.saturation:
            gray = img @ np.asarray([0.299, 0.587, 0.114], np.float32)
            f = rng.uniform(1 - self.saturation, 1 + self.saturation)
            img = img * f + gray[..., None] * (1 - f)
        img = np.clip(img, 0, 255).astype(np.uint8)
        if self.hue:
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
            shift = rng.uniform(-self.hue, self.hue) * 180
            hsv[..., 0] = (hsv[..., 0].astype(np.int32) + int(shift)) % 180
            img = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
        return {**sample, "image": img}


class ToGray(Transform):
    def __init__(self, p: float = 0.2):
        self.p = p

    def apply(self, sample, rng):
        g = cv2.cvtColor(sample["image"], cv2.COLOR_RGB2GRAY)
        return {**sample, "image": cv2.cvtColor(g, cv2.COLOR_GRAY2RGB)}


class GaussianBlur(Transform):
    def __init__(self, p: float = 0.5, ksize: int = 5):
        self.p = p
        self.ksize = ksize

    def apply(self, sample, rng):
        sigma = rng.uniform(0.1, 2.0)
        out = cv2.GaussianBlur(sample["image"], (self.ksize, self.ksize), sigma)
        return {**sample, "image": out}


class Normalize(Transform):
    """uint8 [0,255] HWC -> fp32 normalized by ImageNet stats
    (reference: factories.py:144-147)."""

    def __init__(self, mean=IMAGENET_COLOR_MEAN, std=IMAGENET_COLOR_STD,
                 p: float = 1.0):
        self.mean = np.asarray(mean, np.float32) * 255.0
        self.std = np.asarray(std, np.float32) * 255.0
        self.p = p

    def apply(self, sample, rng):
        img = sample["image"].astype(np.float32)
        return {**sample, "image": (img - self.mean) / self.std}


# Masking ops for the gender-bias dataset (reference:
# data/dataloader.py:1169-1503 uses blur/blackout person boxes).
class BlackoutBox(Transform):
    def apply(self, sample, rng):
        img = sample["image"].copy()
        for (x0, y0, x1, y1) in sample.get("boxes", []):
            img[int(y0):int(y1), int(x0):int(x1)] = 0
        return {**sample, "image": img}


class BlurBox(Transform):
    def apply(self, sample, rng):
        img = sample["image"].copy()
        for (x0, y0, x1, y1) in sample.get("boxes", []):
            region = img[int(y0):int(y1), int(x0):int(x1)]
            if region.size:
                img[int(y0):int(y1), int(x0):int(x1)] = cv2.GaussianBlur(
                    region, (31, 31), 15)
        return {**sample, "image": img}


# Registry consumed by ImageTransformsFactory (same names as reference
# factories.py:120-147).
TRANSFORM_PRODUCTS: Dict[str, Callable] = {
    "random_resized_crop": lambda size, **kw: RandomResizedSquareCrop(
        size, scale=kw.pop("scale", (0.2, 1.0)),
        ratio=kw.pop("ratio", (0.75, 4 / 3)), p=kw.pop("p", 1.0)),
    "center_crop": lambda size, **kw: CenterSquareCrop(size, **kw),
    "smallest_resize": lambda size=256, **kw: SmallestMaxSize(size, **kw),
    "global_resize": lambda size, **kw: SquareResize(size, **kw),
    "color_jitter": lambda **kw: ColorJitter(
        brightness=kw.pop("brightness", 0.4), contrast=kw.pop("contrast", 0.4),
        saturation=kw.pop("saturation", 0.4), hue=kw.pop("hue", 0.1),
        p=kw.pop("p", 0.8)),
    "color_jitter8": lambda **kw: ColorJitter(
        brightness=0.8, contrast=0.8, saturation=0.8, hue=0.1,
        p=kw.pop("p", 0.8)),
    "random_gray": lambda **kw: ToGray(p=kw.pop("p", 0.2)),
    "horizontal_flip": lambda **kw: HorizontalFlip(p=kw.pop("p", 0.5)),
    "blur": lambda **kw: GaussianBlur(p=kw.pop("p", 0.5)),
    "normalize": lambda **kw: Normalize(**kw),
}

DEFAULT_IMAGE_TRANSFORM = Compose([
    SmallestMaxSize(256),
    CenterSquareCrop(224),
    Normalize(),
])
