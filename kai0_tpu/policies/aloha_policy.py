"""Aloha (Trossen bimanual) policy transforms.

Parity: reference ``src/openpi/policies/aloha_policy.py`` — 4 cameras with cam_low
dropped, joint-flip mask between Aloha and π joint conventions, and the gripper
linear↔angular conversions with the Interbotix constants (:117-160).
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import numpy as np

from kai0_tpu import transforms as _transforms
from kai0_tpu.policies.bimanual import parse_image


def make_aloha_example() -> dict:
    return {
        "state": np.ones((14,)),
        "images": {
            "cam_high": np.random.randint(256, size=(3, 224, 224), dtype=np.uint8),
            "cam_low": np.random.randint(256, size=(3, 224, 224), dtype=np.uint8),
            "cam_left_wrist": np.random.randint(256, size=(3, 224, 224), dtype=np.uint8),
            "cam_right_wrist": np.random.randint(256, size=(3, 224, 224), dtype=np.uint8),
        },
        "prompt": "do something",
    }


@dataclasses.dataclass(frozen=True)
class AlohaInputs(_transforms.DataTransformFn):
    """state [14]; images CHW keyed by EXPECTED_CAMERAS; actions [horizon, 14]."""

    # Convert joints/grippers between the Aloha space and the π-internal space the
    # base model was trained in.
    adapt_to_pi: bool = True

    EXPECTED_CAMERAS: ClassVar[tuple[str, ...]] = (
        "cam_high",
        "cam_low",
        "cam_left_wrist",
        "cam_right_wrist",
    )

    def __call__(self, data: dict) -> dict:
        in_images = {name: parse_image(img) for name, img in data["images"].items()}
        if set(in_images) - set(self.EXPECTED_CAMERAS):
            raise ValueError(f"Expected images {self.EXPECTED_CAMERAS}, got {tuple(in_images)}")

        state = _decode_state(np.asarray(data["state"]), adapt_to_pi=self.adapt_to_pi)

        base_image = in_images["cam_high"]
        images = {"base_0_rgb": base_image}
        image_masks = {"base_0_rgb": np.True_}
        for dest, source in {
            "left_wrist_0_rgb": "cam_left_wrist",
            "right_wrist_0_rgb": "cam_right_wrist",
        }.items():
            if source in in_images:
                images[dest] = in_images[source]
                image_masks[dest] = np.True_
            else:
                images[dest] = np.zeros_like(base_image)
                image_masks[dest] = np.False_

        inputs = {"image": images, "image_mask": image_masks, "state": state}
        if "actions" in data:
            inputs["actions"] = _encode_actions_inv(np.asarray(data["actions"]), adapt_to_pi=self.adapt_to_pi)
        if "prompt" in data:
            inputs["prompt"] = data["prompt"]
        return inputs


@dataclasses.dataclass(frozen=True)
class AlohaOutputs(_transforms.DataTransformFn):
    adapt_to_pi: bool = True

    def __call__(self, data: dict) -> dict:
        actions = np.asarray(data["actions"][:, :14])
        return {"actions": _encode_actions(actions, adapt_to_pi=self.adapt_to_pi)}


def _joint_flip_mask() -> np.ndarray:
    """Sign flips between Aloha and π joint conventions (aloha_policy.py:107)."""
    return np.array([1, -1, -1, 1, 1, 1, 1, 1, -1, -1, 1, 1, 1, 1])


def _normalize(x, min_val, max_val):
    return (x - min_val) / (max_val - min_val)


def _unnormalize(x, min_val, max_val):
    return x * (max_val - min_val) + min_val


def _gripper_to_angular(value):
    # Aloha stores gripper positions in a linear space; undo that to the angular
    # space π₀ pretrained in. Constants: PUPPET_GRIPPER_POSITION_{OPEN,CLOSED} and
    # the Interbotix linear→radian geometry (aloha_policy.py:117-141).
    value = _unnormalize(value, min_val=0.01844, max_val=0.05800)

    def linear_to_radian(linear_position, arm_length, horn_radius):
        value = (horn_radius**2 + linear_position**2 - arm_length**2) / (2 * horn_radius * linear_position)
        return np.arcsin(np.clip(value, -1.0, 1.0))

    value = linear_to_radian(value, arm_length=0.036, horn_radius=0.022)
    # π₀ gripper data is normalized (0, 1) over encoder counts (2405, 3110) → radians (0.5476, 1.6296).
    return _normalize(value, min_val=0.5476, max_val=1.6296)


def _gripper_from_angular(value):
    # π₀ angular output → Aloha's angular command range (aloha_policy.py:144-153).
    value = value + 0.5476
    return _normalize(value, min_val=-0.6213, max_val=1.4910)


def _gripper_from_angular_inv(value):
    value = _unnormalize(value, min_val=-0.6213, max_val=1.4910)
    return value - 0.5476


def _decode_state(state: np.ndarray, *, adapt_to_pi: bool = False) -> np.ndarray:
    if adapt_to_pi:
        state = _joint_flip_mask() * state
        state[[6, 13]] = _gripper_to_angular(state[[6, 13]])
    return state


def _encode_actions(actions: np.ndarray, *, adapt_to_pi: bool = False) -> np.ndarray:
    if adapt_to_pi:
        actions = _joint_flip_mask() * actions
        actions[:, [6, 13]] = _gripper_from_angular(actions[:, [6, 13]])
    return actions


def _encode_actions_inv(actions: np.ndarray, *, adapt_to_pi: bool = False) -> np.ndarray:
    if adapt_to_pi:
        actions = _joint_flip_mask() * actions
        actions[:, [6, 13]] = _gripper_from_angular_inv(actions[:, [6, 13]])
    return actions
