"""Train-time image augmentation — fused, jit-friendly, TPU-native.

Replaces the reference's augmax chain (model.py:200-212: RandomCrop(95%) → Resize →
Rotate(±5°) → ColorJitter(brightness 0.3, contrast 0.4, saturation 0.5)). The three
geometric ops are composed into a *single* affine warp (one bilinear gather instead of
three resampling passes — less HBM traffic, friendlier to XLA fusion), followed by a
fused color jitter. Operates on [-1, 1] float images like the reference wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

CROP_FRACTION = 0.95
MAX_ROTATION_DEG = 5.0
BRIGHTNESS = 0.3
CONTRAST = 0.4
SATURATION = 0.5


def _affine_warp_single(image: jax.Array, crop_offset: jax.Array, theta: jax.Array) -> jax.Array:
    """Warp one [H, W, C] image: crop(CROP_FRACTION @ offset) → resize back → rotate(theta)."""
    h, w, _ = image.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    # Inverse rotation about the image center.
    cos_t, sin_t = jnp.cos(-theta), jnp.sin(-theta)
    y1 = cos_t * (yy - cy) - sin_t * (xx - cx) + cy
    x1 = sin_t * (yy - cy) + cos_t * (xx - cx) + cx
    # Inverse of crop+resize: scale by the crop fraction, then shift by the crop origin.
    y_in = crop_offset[0] + y1 * CROP_FRACTION
    x_in = crop_offset[1] + x1 * CROP_FRACTION

    return _bilinear_sample(image, y_in, x_in)


def _bilinear_sample(image: jax.Array, y_in: jax.Array, x_in: jax.Array) -> jax.Array:
    """Bilinear sample [H, W, C] at float coords (zero padding outside).

    Four flat gathers over the [H·W, C] table — all channels per tap at once —
    instead of per-channel ``map_coordinates`` (3 channels × 4 taps = 12 gathers);
    gathers are the warp's HBM bottleneck on TPU.
    """
    h, w, c = image.shape
    y0 = jnp.floor(y_in)
    x0 = jnp.floor(x_in)
    wy = (y_in - y0)[..., None]
    wx = (x_in - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    flat = image.reshape(h * w, c)

    def tap(yi, xi):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        return jnp.where(valid, jnp.take(flat, idx, axis=0), 0.0)

    top = tap(y0i, x0i) * (1 - wx) + tap(y0i, x0i + 1) * wx
    bot = tap(y0i + 1, x0i) * (1 - wx) + tap(y0i + 1, x0i + 1) * wx
    return top * (1 - wy) + bot * wy


def _color_jitter_single(rng: jax.Array, image: jax.Array) -> jax.Array:
    """Fused brightness/contrast/saturation jitter on a [0, 1] image."""
    kb, kc, ks = jax.random.split(rng, 3)
    b = jax.random.uniform(kb, (), minval=1.0 - BRIGHTNESS, maxval=1.0 + BRIGHTNESS)
    c = jax.random.uniform(kc, (), minval=1.0 - CONTRAST, maxval=1.0 + CONTRAST)
    s = jax.random.uniform(ks, (), minval=1.0 - SATURATION, maxval=1.0 + SATURATION)

    image = image * b
    mean = jnp.mean(image, axis=(-3, -2, -1), keepdims=True)
    image = (image - mean) * c + mean
    gray = jnp.mean(image, axis=-1, keepdims=True)
    image = gray + (image - gray) * s
    return jnp.clip(image, 0.0, 1.0)


@functools.partial(jax.jit, static_argnums=(2,))
def augment_image(rng: jax.Array, images: jax.Array, crop_and_rotate: bool = True) -> jax.Array:
    """Augment a batch of [-1, 1] float images ``[B, H, W, C]``.

    Non-wrist cameras (``crop_and_rotate=True``) get the geometric warp + color jitter;
    wrist cameras get color jitter only (parity: reference model.py:201-209).
    """
    b, h, w, _ = images.shape
    images = images / 2.0 + 0.5  # [-1, 1] -> [0, 1]

    rngs = jax.random.split(rng, b)

    if crop_and_rotate:

        def geo(rng_i, img):
            ko, kt = jax.random.split(rng_i)
            max_off_y = h * (1.0 - CROP_FRACTION)
            max_off_x = w * (1.0 - CROP_FRACTION)
            off = jax.random.uniform(ko, (2,)) * jnp.array([max_off_y, max_off_x])
            theta = jax.random.uniform(
                kt, (), minval=-MAX_ROTATION_DEG, maxval=MAX_ROTATION_DEG
            ) * (jnp.pi / 180.0)
            return _affine_warp_single(img, off, theta)

        images = jax.vmap(geo)(rngs, images)

    jitter_rngs = jax.vmap(lambda k: jax.random.fold_in(k, 1))(rngs)
    images = jax.vmap(_color_jitter_single)(jitter_rngs, images)

    return images * 2.0 - 1.0  # back to [-1, 1]
