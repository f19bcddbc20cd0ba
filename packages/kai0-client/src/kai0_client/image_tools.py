"""Client-side image helpers (PIL): bandwidth reduction before the wire.

Parity: reference ``openpi_client/image_tools.py`` — aspect-preserving
``resize_with_pad`` and ``convert_to_uint8``.
"""

from __future__ import annotations

import numpy as np


def convert_to_uint8(img: np.ndarray) -> np.ndarray:
    """Float images in [0, 1] → uint8; uint8 passes through."""
    if np.issubdtype(img.dtype, np.floating):
        return (255 * img).astype(np.uint8)
    return img


def resize_with_pad(images: np.ndarray, height: int, width: int, method=None) -> np.ndarray:
    """Resize preserving aspect ratio, centre-padding with zeros to (height, width).

    Accepts ``[..., H, W, C]`` uint8 or float arrays.
    """
    from PIL import Image

    if method is None:
        method = Image.BILINEAR

    if images.shape[-3] == height and images.shape[-2] == width:
        return images

    original_shape = images.shape
    flat = images.reshape(-1, *original_shape[-3:])
    out = np.stack([_resize_one(im, height, width, method) for im in flat])
    return out.reshape(*original_shape[:-3], height, width, original_shape[-1])


def _resize_one(img: np.ndarray, height: int, width: int, method) -> np.ndarray:
    from PIL import Image

    cur_h, cur_w = img.shape[:2]
    ratio = max(cur_w / width, cur_h / height)
    resized_h = int(cur_h / ratio)
    resized_w = int(cur_w / ratio)

    is_float = np.issubdtype(img.dtype, np.floating)
    pil = Image.fromarray(convert_to_uint8(img) if is_float else img)
    pil = pil.resize((resized_w, resized_h), resample=method)
    resized = np.asarray(pil)
    if is_float:
        resized = resized.astype(img.dtype) / 255.0

    zero_h = (height - resized_h) // 2
    zero_w = (width - resized_w) // 2
    padded = np.zeros((height, width, *img.shape[2:]), dtype=resized.dtype)
    padded[zero_h : zero_h + resized_h, zero_w : zero_w + resized_w] = resized
    return padded
