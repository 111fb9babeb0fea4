"""On-device preprocessing tests: XLA path + Pallas kernel (interpret mode
on CPU) against the host Normalize transform."""

import numpy as np

import jax
import jax.numpy as jnp

from clip_lite_tpu.data import transforms as T
from clip_lite_tpu.ops.image_ops import (
    device_preprocess,
    normalize_images,
    random_flip,
)
from clip_lite_tpu.ops.pallas_kernels import normalize_u8


def _host_normalized(img_u8):
    rng = np.random.default_rng(0)
    return np.stack([T.Normalize()({"image": i}, rng)["image"]
                     for i in img_u8])


def test_normalize_matches_host_transform():
    imgs = np.random.RandomState(0).randint(0, 256, (4, 8, 8, 3), np.uint8)
    out = normalize_images(jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(out), _host_normalized(imgs),
                               rtol=1e-5, atol=1e-5)


def test_pallas_normalize_matches_xla():
    imgs = np.random.RandomState(1).randint(0, 256, (2, 16, 32, 3), np.uint8)
    ref = normalize_images(jnp.asarray(imgs))
    out = normalize_u8(jnp.asarray(imgs), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pallas_normalize_bf16_and_ragged_rows():
    # rows (B*H = 2*7 = 14) not a multiple of the block: grid padding path.
    imgs = np.random.RandomState(2).randint(0, 256, (2, 7, 8, 3), np.uint8)
    out = normalize_u8(jnp.asarray(imgs), dtype=jnp.bfloat16, block_rows=8,
                       interpret=True)
    ref = normalize_images(jnp.asarray(imgs))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)


def test_random_flip_half_rate_and_correct():
    imgs = jnp.asarray(
        np.random.RandomState(3).randint(0, 256, (64, 4, 6, 3), np.uint8))
    out = random_flip(imgs, jax.random.PRNGKey(0))
    flipped = np.asarray(jnp.flip(imgs, axis=2))
    orig = np.asarray(imgs)
    got = np.asarray(out)
    n_flipped = sum(bool(np.array_equal(got[i], flipped[i]))
                    for i in range(64))
    n_orig = sum(bool(np.array_equal(got[i], orig[i])) for i in range(64))
    assert n_flipped + n_orig == 64
    assert 16 <= n_flipped <= 48  # p=0.5 within loose bounds


def test_device_preprocess_end_to_end():
    imgs = jnp.asarray(
        np.random.RandomState(4).randint(0, 256, (4, 8, 8, 3), np.uint8))
    out = device_preprocess(imgs, jax.random.PRNGKey(1), flip=True,
                            dtype=jnp.float32)
    assert out.shape == (4, 8, 8, 3)
    assert out.dtype == jnp.float32
    assert abs(float(jnp.mean(out))) < 1.0  # roughly centered


def test_hsv_round_trip_identity():
    from clip_lite_tpu.ops.image_ops import _hsv_to_rgb, _rgb_to_hsv

    rgb = jnp.asarray(
        np.random.RandomState(5).rand(32, 4, 4, 3), jnp.float32)
    h, s, v = _rgb_to_hsv(rgb)
    back = _hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_rgb_to_hsv_matches_colorsys():
    import colorsys

    from clip_lite_tpu.ops.image_ops import _rgb_to_hsv

    pix = np.random.RandomState(6).rand(50, 3).astype(np.float32)
    h, s, v = _rgb_to_hsv(jnp.asarray(pix))
    for i in range(50):
        eh, es, ev = colorsys.rgb_to_hsv(*pix[i])
        assert abs(float(h[i]) - eh) < 1e-5
        assert abs(float(s[i]) - es) < 1e-5
        assert abs(float(v[i]) - ev) < 1e-5


def test_random_hue_zero_shift_is_identity_and_rotates():
    from clip_lite_tpu.ops.image_ops import random_hue

    imgs = jnp.asarray(
        np.random.RandomState(7).randint(0, 256, (8, 6, 6, 3), np.uint8))
    out0 = random_hue(imgs.astype(jnp.float32), jax.random.PRNGKey(0),
                      hue=0.0)
    np.testing.assert_allclose(np.asarray(out0),
                               np.asarray(imgs, np.float32), atol=0.51)
    out = random_hue(imgs.astype(jnp.float32), jax.random.PRNGKey(0),
                     hue=0.4)
    # hue rotation preserves value = max channel per pixel
    np.testing.assert_allclose(
        np.asarray(jnp.max(out, -1)),
        np.asarray(jnp.max(imgs, -1), np.float32), atol=0.6)
    # ...but moves mass between channels
    assert float(jnp.abs(out - imgs.astype(jnp.float32)).mean()) > 1.0
