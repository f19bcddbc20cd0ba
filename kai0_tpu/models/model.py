"""Model-facing data structures and observation preprocessing.

Parity: reference ``src/openpi/models/model.py`` — ``Observation``/``Actions``
dataclasses with the dict mapping contract (:122-164), uint8→[-1,1] conversion,
``preprocess_observation`` with train-time image augmentation (:172-241), the
``ModelType`` enum (:30-37) and the image-key/resolution constants (:41-49).

The torch mirror is intentionally absent: this framework is single-idiom JAX; the
Advantage Estimator is a JAX head (see ``kai0_tpu/models/advantage.py``).
"""

from __future__ import annotations

from collections.abc import Sequence
import dataclasses
import enum
import logging

import jax
import jax.numpy as jnp
import numpy as np

from kai0_tpu.models import augment as _augment
from kai0_tpu.shared import image_tools

logger = logging.getLogger("kai0_tpu")


class ModelType(enum.Enum):
    PI0 = "pi0"
    PI0_FAST = "pi0_fast"
    PI05 = "pi05"
    PI0_RTC = "pi0_rtc"
    PI05_RTC = "pi05_rtc"


# The model always expects these images.
IMAGE_KEYS = (
    "base_0_rgb",
    "left_wrist_0_rgb",
    "right_wrist_0_rgb",
)

IMAGE_RESOLUTION = (224, 224)


def _to_float_image(arr):
    if hasattr(arr, "dtype") and arr.dtype == np.uint8:
        return np.asarray(arr).astype(np.float32) / 255.0 * 2.0 - 1.0
    if hasattr(arr, "dtype") and arr.dtype == jnp.uint8:
        return arr.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    return arr


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Observation:
    """Model inputs. See ``from_dict`` for the nested-dict contract produced by transforms."""

    # Images in [-1, 1] float32, keyed by camera name.
    images: dict[str, jax.Array]
    # Image validity masks, same keys.
    image_masks: dict[str, jax.Array]
    # Low-dimensional robot state.
    state: jax.Array

    tokenized_prompt: jax.Array | None = None
    tokenized_prompt_mask: jax.Array | None = None

    # π₀-FAST-specific fields.
    token_ar_mask: jax.Array | None = None
    token_loss_mask: jax.Array | None = None

    # Advantage-estimator-specific fields.
    episode_index: jax.Array | None = None
    frame_index: jax.Array | None = None
    progress: jax.Array | None = None
    episode_length: jax.Array | None = None

    @classmethod
    def from_dict(cls, data: dict) -> "Observation":
        if ("tokenized_prompt" in data) != ("tokenized_prompt_mask" in data):
            raise ValueError("tokenized_prompt and tokenized_prompt_mask must be provided together.")
        images = {k: _to_float_image(v) for k, v in data["image"].items()}
        return cls(
            images=images,
            image_masks=data["image_mask"],
            state=data["state"],
            tokenized_prompt=data.get("tokenized_prompt"),
            tokenized_prompt_mask=data.get("tokenized_prompt_mask"),
            token_ar_mask=data.get("token_ar_mask"),
            token_loss_mask=data.get("token_loss_mask"),
            episode_index=data.get("episode_index"),
            frame_index=data.get("frame_index"),
            progress=data.get("progress"),
            episode_length=data.get("episode_length"),
        )

    def to_dict(self) -> dict:
        result = dataclasses.asdict(self)
        result["image"] = result.pop("images")
        result["image_mask"] = result.pop("image_masks")
        return result


# Actions: float32[*b, action_horizon, action_dim], included as "actions" in transform dicts.
Actions = jax.Array


def preprocess_observation(
    rng: jax.Array | None,
    observation: Observation,
    *,
    train: bool = False,
    image_keys: Sequence[str] = IMAGE_KEYS,
    image_resolution: tuple[int, int] = IMAGE_RESOLUTION,
) -> Observation:
    """Resize images if needed, apply train-time augmentation, default-fill image masks.

    Augmentation parity (reference model.py:196-216, augmax chain): non-wrist cameras
    get RandomCrop(95%) → Resize → Rotate(±5°); all cameras get ColorJitter
    (brightness 0.3, contrast 0.4, saturation 0.5) — implemented as fused jit-friendly
    JAX ops in ``kai0_tpu/models/augment.py`` rather than via augmax.
    """
    if not set(image_keys).issubset(observation.images):
        raise ValueError(f"images dict missing keys: expected {image_keys}, got {list(observation.images)}")

    batch_shape = observation.state.shape[:-1]

    out_images = {}
    for key in image_keys:
        image = observation.images[key]
        if image.shape[1:3] != image_resolution:
            logger.info(f"Resizing image {key} from {image.shape[1:3]} to {image_resolution}")
            image = image_tools.resize_with_pad(image, *image_resolution)

        if train:
            rng, sub = jax.random.split(rng)
            image = _augment.augment_image(sub, image, crop_and_rotate="wrist" not in key)

        out_images[key] = image

    out_masks = {}
    for key in out_images:
        if key not in observation.image_masks:
            out_masks[key] = jnp.ones(batch_shape, dtype=jnp.bool_)
        else:
            out_masks[key] = jnp.asarray(observation.image_masks[key])

    return dataclasses.replace(observation, images=out_images, image_masks=out_masks)
