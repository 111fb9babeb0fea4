"""On-device image preprocessing: uint8 batches in, normalized tensors out.

The reference burns CPU workers on albumentations normalize/flip and ships
fp32 NCHW tensors over PCIe (reference: factories.py:144-147,
transforms.py:156-181).  The TPU-native pipeline ships **uint8** batches
(4x less host->device bandwidth) and finishes preprocessing on device
inside the compiled step:

  * per-image random horizontal flip (XLA reverse, fused);
  * uint8 -> float conversion + per-channel ImageNet affine normalization,
    either as XLA ops (fused into the stem conv's input) or as the fused
    Pallas kernel in ops/pallas_kernels.py (one HBM round-trip).

Use ``DATA.IMAGE_TRANSFORM_*`` without "normalize" and with
``device_preprocess=True`` to activate this path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from clip_lite_tpu.data.transforms import (
    IMAGENET_COLOR_MEAN,
    IMAGENET_COLOR_STD,
)


def normalize_images(images: jax.Array, dtype=jnp.float32,
                     use_pallas: bool = False) -> jax.Array:
    """(B, H, W, 3) uint8 (or float in [0,255]) -> normalized ``dtype``."""
    if use_pallas:
        from clip_lite_tpu.ops.pallas_kernels import normalize_u8

        return normalize_u8(images, dtype=dtype)
    mean = jnp.asarray(IMAGENET_COLOR_MEAN, jnp.float32) * 255.0
    inv_std = 1.0 / (jnp.asarray(IMAGENET_COLOR_STD, jnp.float32) * 255.0)
    out = (images.astype(jnp.float32) - mean) * inv_std
    return out.astype(dtype)


def random_flip(images: jax.Array, rng: jax.Array) -> jax.Array:
    """Per-image random horizontal flip (p=0.5) on device."""
    flips = jax.random.bernoulli(rng, 0.5, (images.shape[0],))
    flipped = jnp.flip(images, axis=2)
    return jnp.where(flips[:, None, None, None], flipped, images)


def _rgb_to_hsv(x: jax.Array):
    """(..., 3) RGB in [0,1] -> (h, s, v) each (...,), h in [0,1)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    v = maxc
    c = maxc - minc
    s = jnp.where(maxc > 0, c / jnp.maximum(maxc, 1e-12), 0.0)
    safe_c = jnp.maximum(c, 1e-12)
    rc = (maxc - r) / safe_c
    gc = (maxc - g) / safe_c
    bc = (maxc - b) / safe_c
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(c > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h: jax.Array, s: jax.Array, v: jax.Array) -> jax.Array:
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6

    def sel(a0, a1, a2, a3, a4, a5):
        return jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4],
                          [a0, a1, a2, a3, a4], a5)

    return jnp.stack([sel(v, q, p, p, t, v),
                      sel(t, v, v, q, p, p),
                      sel(p, p, t, v, v, q)], axis=-1)


def random_hue(images: jax.Array, rng: jax.Array,
               hue: float = 0.1) -> jax.Array:
    """Per-image hue rotation by a uniform shift in [-hue, hue] (fraction
    of the color wheel), via an exact on-device HSV round-trip — the part
    of the reference's ColorJitter (reference: factories.py:132-137) that
    round 1 left host-only.  Input/output in [0,255] float."""
    b = images.shape[0]
    shift = jax.random.uniform(rng, (b, 1, 1), minval=-hue, maxval=hue)
    h, s, v = _rgb_to_hsv(images.astype(jnp.float32) / 255.0)
    rgb = _hsv_to_rgb((h + shift) % 1.0, s, v)
    return jnp.clip(rgb * 255.0, 0.0, 255.0)


def random_color_jitter(images: jax.Array, rng: jax.Array,
                        brightness: float = 0.4, contrast: float = 0.4,
                        saturation: float = 0.4, hue: float = 0.1,
                        p: float = 0.8) -> jax.Array:
    """Per-image brightness/contrast/saturation/hue jitter in [0,255]
    space, entirely on device (elementwise + per-image scalars — VPU
    work).  Mirrors the host ColorJitter's factor laws
    (data/transforms.py), including the HSV hue rotation.
    """
    b = images.shape[0]
    k_apply, k_b, k_c, k_s, k_h = jax.random.split(rng, 5)
    x = images.astype(jnp.float32)

    fb = jax.random.uniform(k_b, (b, 1, 1, 1), minval=1 - brightness,
                            maxval=1 + brightness)
    x = x * fb

    fc = jax.random.uniform(k_c, (b, 1, 1, 1), minval=1 - contrast,
                            maxval=1 + contrast)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = (x - mean) * fc + mean

    fs = jax.random.uniform(k_s, (b, 1, 1, 1), minval=1 - saturation,
                            maxval=1 + saturation)
    gray = jnp.sum(x * jnp.asarray([0.299, 0.587, 0.114]), axis=-1,
                   keepdims=True)
    x = x * fs + gray * (1 - fs)

    x = jnp.clip(x, 0.0, 255.0)
    if hue:
        x = random_hue(x, k_h, hue)

    apply = jax.random.bernoulli(k_apply, p, (b, 1, 1, 1))
    return jnp.where(apply, x, images.astype(jnp.float32))


def device_preprocess(images_u8: jax.Array, rng: Optional[jax.Array] = None,
                      flip: bool = True, color_jitter: bool = False,
                      dtype=jnp.float32, use_pallas: bool = False) -> jax.Array:
    """Full on-device tail of the augmentation pipeline."""
    if rng is not None and (flip or color_jitter):
        k_flip, k_jit = jax.random.split(rng)
        if flip:
            images_u8 = random_flip(images_u8, k_flip)
        if color_jitter:
            images_u8 = random_color_jitter(images_u8, k_jit)
    return normalize_images(images_u8, dtype=dtype, use_pallas=use_pallas)
