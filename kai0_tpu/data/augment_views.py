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
    total = left_dim + right_dim
    if left_dim != right_dim or arr.shape[-1] < total:
        # unequal blocks / short rows: defer to the per-row function so the
        # error behavior stays identical to the offline rewrite's
        flat = arr.reshape(-1, arr.shape[-1])
        out = np.stack([_sm.swap_arms_in_array(row, left_dim, right_dim) for row in flat])
        return out.reshape(arr.shape)
    # hot path (loader workers run this per mirrored item): the swap is a fixed
    # column permutation — one fancy-index instead of a per-timestep Python loop
    perm = np.concatenate(
        [np.arange(left_dim, total), np.arange(left_dim), np.arange(total, arr.shape[-1])]
    )
    return arr[..., perm]


class TimeScaledView:
    """Training-time time-scaling view: episodes play back ``factor``× faster.

    Serves exactly the frames the offline ``time_scaling.time_scale_dataset``
    keeps (rows 0, N, 2N, … of every episode): state/video come from the
    strided frame, action chunks gather rows at stride N — clamped at the last
    KEPT frame, which reproduces LeRobot's edge padding on the offline-rewritten
    episode — and the bookkeeping columns (``frame_index``/``timestamp``/
    ``index``) are resequenced like the offline rewrite
    (``time_scaling._rescale_episode_parquet``). Offline equivalence is pinned
    by tests/test_augment.py::test_time_scaled_view_matches_offline_rewrite.

    Wraps a raw :class:`~kai0_tpu.data.lerobot_dataset.LeRobotDataset` (it
    gathers strided action rows through ``get_frame``'s ``index_map`` hook —
    decoding ``action_horizon`` full items per chunk would cost 50 video reads
    each);
    compose with :class:`MirroredView` by applying this view first. The offline
    split mode (scale a fraction, merge with the untouched rest) stays an
    offline pipeline — use ``time_scaling.time_scaling_with_split`` for that.
    """

    def __init__(self, dataset, factor: int):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self._dataset = dataset
        self._factor = int(factor)
        self._kept = [
            -(-dataset.episode_length(e) // self._factor) for e in dataset.episode_indices
        ]
        self._offsets = np.cumsum([0] + self._kept)

    def __len__(self) -> int:
        return int(self._offsets[-1])

    @property
    def tasks(self):
        return self._dataset.tasks

    @property
    def episode_indices(self):
        """Episode set passthrough (MirroredView renumbers against it)."""
        return self._dataset.episode_indices

    def __getitem__(self, index: int) -> dict:
        index = int(index)
        if index < 0 or index >= len(self):
            raise IndexError(index)
        ds = self._dataset
        pos = int(np.searchsorted(self._offsets, index, side="right")) - 1
        episode = ds.episode_indices[pos]
        k = index - int(self._offsets[pos])
        f = self._factor

        # Frame assembly is get_frame's: logical rows 0..kept-1 map to the
        # strided physical rows 0, f, 2f, … (chunk clamp at the last KEPT frame
        # reproduces LeRobot's edge padding on the offline-rewritten episode).
        item = ds.get_frame(
            episode, k, index_map=lambda i: i * f, logical_length=self._kept[pos]
        )
        if "frame_index" in item:
            item["frame_index"] = np.int64(k)
        if "timestamp" in item:
            item["timestamp"] = np.float64(k / ds.fps)
        if "index" in item:
            item["index"] = np.int64(int(self._offsets[pos]) + k)
        return item


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
        # Offline create_mirror_and_merge appends the mirrored episodes with
        # FRESH episode/global-frame indices; mirror that so mirrored twins are
        # never bookkeeping-identical to their originals (episode grouping,
        # dedup, resume logic). None when the inner dataset has no episode set.
        eps = getattr(dataset, "episode_indices", None)
        # max+1 (= count for the usual contiguous 0..E-1 set, collision-free
        # for episode subsets) — matches the offline merge's renumbering.
        self._episode_offset = (max(eps) + 1) if eps else None

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
            elif key == "episode_index" and self._episode_offset is not None:
                out[key] = np.int64(int(value) + self._episode_offset)
            elif key == "index":
                out[key] = np.int64(int(value) + n)
            else:
                out[key] = value
        return out
