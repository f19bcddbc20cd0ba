"""Image resizing utilities (JAX, jit-compiled).

Behavioral parity with reference ``src/openpi/shared/image_tools.py:11-53``:
aspect-preserving resize + centered black padding (tf.image.resize_with_pad
semantics). uint8 images are rounded/clipped back to uint8; float32 images are
assumed to be in [-1, 1] and padded with -1.
"""

from __future__ import annotations

import functools

import numpy as np

# jax is imported lazily so data-loader worker processes (numpy/cv2 only) never
# pay the jax import / backend-plugin cost.


def resize_with_pad(images, height: int, width: int, method=None):
    """Resize ``[*b, h, w, c]`` images to (height, width) without distortion, padding with black."""
    import jax

    if method is None:
        method = jax.image.ResizeMethod.LINEAR
    return _resize_with_pad_jit(images, height, width, method)


@functools.cache
def _get_resize_jit():
    import jax

    return jax.jit(_resize_with_pad_impl, static_argnums=(1, 2, 3))


def _resize_with_pad_jit(images, height, width, method):
    return _get_resize_jit()(images, height, width, method)


def _resize_with_pad_impl(images, height: int, width: int, method):
    import jax
    import jax.numpy as jnp
    has_batch_dim = images.ndim == 4
    if not has_batch_dim:
        images = images[None]
    cur_height, cur_width = images.shape[1:3]
    ratio = max(cur_width / width, cur_height / height)
    resized_height = int(cur_height / ratio)
    resized_width = int(cur_width / ratio)
    resized_images = jax.image.resize(
        images, (images.shape[0], resized_height, resized_width, images.shape[3]), method=method
    )
    if images.dtype == jnp.uint8:
        resized_images = jnp.round(resized_images).clip(0, 255).astype(jnp.uint8)
    elif images.dtype == jnp.float32:
        resized_images = resized_images.clip(-1.0, 1.0)
    else:
        raise ValueError(f"Unsupported image dtype: {images.dtype}")

    pad_h0, remainder_h = divmod(height - resized_height, 2)
    pad_h1 = pad_h0 + remainder_h
    pad_w0, remainder_w = divmod(width - resized_width, 2)
    pad_w1 = pad_w0 + remainder_w
    padded_images = jnp.pad(
        resized_images,
        ((0, 0), (pad_h0, pad_h1), (pad_w0, pad_w1), (0, 0)),
        constant_values=0 if images.dtype == jnp.uint8 else -1.0,
    )
    if not has_batch_dim:
        padded_images = padded_images[0]
    return padded_images


def resize_with_pad_np(images: np.ndarray, height: int, width: int) -> np.ndarray:
    """NumPy/CPU variant for data-loader workers (no device round-trip).

    Uses OpenCV bilinear resize when available (fast C++ path), falling back to the
    jitted JAX version.
    """
    try:
        import cv2
    except ImportError:  # pragma: no cover
        return np.asarray(resize_with_pad(images, height, width))

    has_batch_dim = images.ndim == 4
    if not has_batch_dim:
        images = images[None]
    cur_height, cur_width = images.shape[1:3]
    if (cur_height, cur_width) == (height, width):
        return images if has_batch_dim else images[0]
    ratio = max(cur_width / width, cur_height / height)
    resized_height = int(cur_height / ratio)
    resized_width = int(cur_width / ratio)

    out = np.empty((images.shape[0], height, width, images.shape[3]), dtype=images.dtype)
    pad_h0, remainder_h = divmod(height - resized_height, 2)
    pad_w0, remainder_w = divmod(width - resized_width, 2)
    fill = 0 if images.dtype == np.uint8 else -1.0
    out[:] = fill
    for i, img in enumerate(images):
        resized = cv2.resize(img, (resized_width, resized_height), interpolation=cv2.INTER_LINEAR)
        if resized.ndim == 2:
            resized = resized[..., None]
        if images.dtype == np.float32:
            resized = np.clip(resized, -1.0, 1.0)
        out[i, pad_h0 : pad_h0 + resized_height, pad_w0 : pad_w0 + resized_width] = resized
    return out if has_batch_dim else out[0]


def convert_to_uint8(img: np.ndarray) -> np.ndarray:
    """Convert a [-1, 1] or [0, 1] float image to uint8, passing uint8 through."""
    if np.issubdtype(img.dtype, np.floating):
        if img.min() < -1e-4:
            img = img / 2.0 + 0.5  # [-1, 1] -> [0, 1]
        img = (255 * np.clip(img, 0.0, 1.0)).astype(np.uint8)
    return img
