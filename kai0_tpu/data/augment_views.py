"""Training-time augmentation views over random-access datasets.

The reference ships train-deploy-alignment augmentations as OFFLINE dataset
rewrites (reference ``train_deploy_alignment/data_augment/space_mirroring.py:39-65``
arm swap, :530-560 video flip) — double the disk, an extra pipeline step, and a
lossy mp4 re-encode of every flipped video. On TPU hosts the input pipeline has
CPU to spare (PERF.md "Input pipeline"), so the same augmentation can be a
dataset VIEW applied at load time: index space doubles, the upper half serves
the horizontally mirrored twin of each frame, and the flip happens on the
DECODED frame (lossless — strictly better than the offline re-encode).

Offline-equivalence is pinned by
tests/test_augment.py::test_mirrored_view_matches_offline_rewrite: a
``MirroredView`` over the source dataset produces the same items as a
``LeRobotDataset`` over ``create_mirror_and_merge``'s output (states/actions
exact, images within mp4 re-encode tolerance).

Jax-free on purpose: data-loader worker processes unpickle these classes
(see kai0_tpu/data/transformed.py).
"""

from __future__ import annotations

import numpy as np

from kai0_tpu.augment import space_mirroring as _sm

_IMAGE_PREFIX = "observation.images."


def _swap_arm_blocks(value: np.ndarray, left_dim: int, right_dim: int) -> np.ndarray:
    """Arm-block swap along the LAST axis (offline ``swap_arms_in_array`` is
    per-parquet-row; loader items carry chunked ``[action_horizon, dim]``
    actions, so the swap applies per timestep row)."""
    arr = np.asarray(value)
    if arr.ndim <= 1:
        return _sm.swap_arms_in_array(arr, left_dim, right_dim)
    flat = arr.reshape(-1, arr.shape[-1])
    out = np.stack([_sm.swap_arms_in_array(row, left_dim, right_dim) for row in flat])
    return out.reshape(arr.shape)


class MirroredView:
    """Dataset view serving every frame plus its space-mirrored twin.

    ``index < len(inner)`` → the original item; ``index >= len(inner)`` → the
    mirror: arm blocks swapped in ``swap_columns`` (state + chunked actions),
    every ``observation.images.*`` frame flipped horizontally with the wrist
    cameras swapped into each other's slots (``camera_swap``), everything else
    (prompts, task indices, progress) passed through — exactly the offline
    ``create_mirror_and_merge`` layout, which appends the mirrored episodes
    after the originals.

    Norm stats note: compute them THROUGH this view (``compute_norm_stats``
    iterates the configured loader, so a config with ``augment_mirror=True``
    already does) — stats computed on the unmirrored data are only correct for
    symmetric setups, same as the offline pipeline's mirrored-stats merge.
    """

    def __init__(
        self,
        dataset,
        *,
        left_dim: int = 7,
        right_dim: int = 7,
        swap_columns=_sm.DEFAULT_SWAP_COLUMNS,
        camera_swap: dict[str, str] | None = None,
    ):
        self._dataset = dataset
        self._left_dim = left_dim
        self._right_dim = right_dim
        self._swap_columns = tuple(swap_columns)
        self._camera_swap = (
            dict(camera_swap) if camera_swap is not None else dict(_sm.DEFAULT_CAMERA_SWAP)
        )

    def __len__(self) -> int:
        return 2 * len(self._dataset)

    @property
    def tasks(self):
        """Task table passthrough (PromptFromLeRobotTask reads it)."""
        return self._dataset.tasks

    def __getitem__(self, index: int) -> dict:
        index = int(index)
        n = len(self._dataset)
        if index < n:
            return self._dataset[index]
        item = self._dataset[index - n]
        out: dict = {}
        for key, value in item.items():
            if key in self._swap_columns:
                out[key] = _swap_arm_blocks(value, self._left_dim, self._right_dim)
            elif key.startswith(_IMAGE_PREFIX):
                # The flipped right-wrist view lands in the left-wrist slot and
                # vice versa (offline :553-556); the copy drops the negative
                # stride for downstream consumers.
                target = self._camera_swap.get(key, key)
                out[target] = np.ascontiguousarray(np.asarray(value)[:, ::-1])
            else:
                out[key] = value
        return out
