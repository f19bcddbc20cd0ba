import jax.numpy as jnp
import numpy as np

from kai0_tpu.shared import image_tools


def test_resize_with_pad_identity():
    img = jnp.zeros((224, 224, 3), dtype=jnp.uint8)
    out = image_tools.resize_with_pad(img, 224, 224)
    assert out.shape == (224, 224, 3)


def test_resize_with_pad_aspect_preserving():
    img = jnp.full((480, 640, 3), 255, dtype=jnp.uint8)
    out = image_tools.resize_with_pad(img, 224, 224)
    assert out.shape == (224, 224, 3)
    # width-limited: 640/224 ratio → resized height 168 → vertical black bars
    assert np.asarray(out)[0, 112].sum() == 0  # top padding is black
    assert np.asarray(out)[112, 112].sum() == 255 * 3  # center is white


def test_resize_with_pad_float():
    img = jnp.ones((2, 100, 200, 3), dtype=jnp.float32)
    out = image_tools.resize_with_pad(img, 64, 64)
    assert out.shape == (2, 64, 64, 3)
    assert np.asarray(out).min() == -1.0  # float padding is -1


def test_resize_with_pad_np_matches_shape():
    img = np.full((480, 640, 3), 128, dtype=np.uint8)
    out = image_tools.resize_with_pad_np(img, 224, 224)
    assert out.shape == (224, 224, 3)
    assert out.dtype == np.uint8
    # same geometry as the JAX version
    jout = np.asarray(image_tools.resize_with_pad(jnp.asarray(img), 224, 224))
    assert (out == 0).all(axis=-1).sum() == (jout == 0).all(axis=-1).sum()


def test_convert_to_uint8():
    f = np.linspace(-1, 1, 12).reshape(2, 2, 3).astype(np.float32)
    out = image_tools.convert_to_uint8(f)
    assert out.dtype == np.uint8
    assert out.max() == 255
    u = np.zeros((2, 2, 3), np.uint8)
    assert image_tools.convert_to_uint8(u) is u
