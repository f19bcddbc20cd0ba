"""LeRobot dataset reader with action-horizon chunking.

Self-contained counterpart of the reference's use of the ``lerobot`` package
(reference ``src/openpi/training/data_loader.py:131-152``): per-episode parquet
tables, per-camera mp4 videos decoded on demand, and action sequences assembled via
delta timestamps ``[t / fps for t in range(action_horizon)]`` with edge padding past
the episode end (LeRobot's own padding semantics).

TPU-first execution notes: reads happen inside the thread-pooled loader
(``kai0_tpu.training.data_loader``), so all caches here are thread-local (cv2
``VideoCapture`` objects are not thread-safe) and parquet tables are memoized
per-episode with a small LRU.
"""

from __future__ import annotations

import collections
import os
import pathlib
import threading

import numpy as np

from kai0_tpu.data import lerobot_meta as _meta

# Per-frame scalar bookkeeping columns present in every LeRobot parquet.
_SCALAR_COLUMNS = ("timestamp", "frame_index", "episode_index", "index", "task_index")


def resolve_dataset_root(repo_id: str) -> pathlib.Path:
    """Resolve a repo id to a local dataset root.

    Accepts absolute/relative paths directly; otherwise looks under
    ``$LEROBOT_HOME`` (default ``~/.cache/kai0_tpu/lerobot``), then falls back to a
    HuggingFace hub snapshot download when network access exists.
    """
    import os

    path = pathlib.Path(repo_id)
    if path.exists():
        return path
    home = pathlib.Path(os.environ.get("LEROBOT_HOME", "~/.cache/kai0_tpu/lerobot")).expanduser()
    local = home / repo_id
    if local.exists():
        return local
    try:
        import huggingface_hub

        return pathlib.Path(
            huggingface_hub.snapshot_download(repo_id, repo_type="dataset", local_dir=str(local))
        )
    except Exception as e:  # noqa: BLE001
        raise FileNotFoundError(
            f"Dataset {repo_id!r} not found locally ({local}) and hub download failed: {e}"
        ) from e


class _EpisodeTableCache:
    """Thread-safe LRU of per-episode parquet tables as column->np.ndarray dicts."""

    def __init__(self, metadata: _meta.LeRobotMetadata, max_items: int = 16):
        self._metadata = metadata
        self._max_items = max_items
        self._lock = threading.Lock()
        self._cache: collections.OrderedDict[int, dict[str, np.ndarray]] = collections.OrderedDict()

    def get(self, episode_index: int) -> dict[str, np.ndarray]:
        with self._lock:
            if episode_index in self._cache:
                self._cache.move_to_end(episode_index)
                return self._cache[episode_index]
        table = self._load(episode_index)
        with self._lock:
            self._cache[episode_index] = table
            self._cache.move_to_end(episode_index)
            while len(self._cache) > self._max_items:
                self._cache.popitem(last=False)
        return table

    def _load(self, episode_index: int) -> dict[str, np.ndarray]:
        import pyarrow.parquet as pq

        table = pq.read_table(self._metadata.data_path(episode_index))
        out: dict[str, np.ndarray] = {}
        for name in table.column_names:
            col = table.column(name).to_numpy(zero_copy_only=False)
            if col.dtype == object:  # list-valued column → 2-D float array
                col = np.stack([np.asarray(x, dtype=np.float32) for x in col])
            out[name] = col
        return out


_CAPS_PER_THREAD = int(os.environ.get("KAI0_VIDEO_CAPS_PER_THREAD", "64"))


class _VideoReader:
    """Thread-local cv2 video readers with sequential-read fast path."""

    def __init__(self):
        self._local = threading.local()

    def read_frame(self, path: pathlib.Path, frame_index: int) -> np.ndarray:
        import cv2

        caps = getattr(self._local, "caps", None)
        if caps is None:
            caps = self._local.caps = collections.OrderedDict()
        key = str(path)
        entry = caps.get(key)
        if entry is None:
            cap = cv2.VideoCapture(key)
            if not cap.isOpened():
                raise FileNotFoundError(f"Cannot open video {path}")
            entry = caps[key] = {"cap": cap, "next": 0}
            # LRU sized well above the typical working set (episodes × cameras hit
            # by one worker): evicting an open capture costs a reopen + keyframe
            # seek (~10× a sequential read), which cripples threaded loading.
            while len(caps) > _CAPS_PER_THREAD:
                _, old = caps.popitem(last=False)
                old["cap"].release()
        caps.move_to_end(key)
        cap = entry["cap"]
        if frame_index != entry["next"]:
            cap.set(cv2.CAP_PROP_POS_FRAMES, frame_index)
        ok, frame = cap.read()
        if not ok:
            raise IOError(f"Failed to read frame {frame_index} from {path}")
        entry["next"] = frame_index + 1
        return frame[..., ::-1].copy()  # BGR → RGB


class LeRobotDataset:
    """Random-access view over a LeRobot dataset with action chunking.

    ``__getitem__`` returns the parquet row for the frame (scalars + vectors), each
    video feature decoded to uint8 RGB ``[H, W, 3]``, and every key listed in
    ``action_sequence_keys`` replaced by a ``[action_horizon, D]`` chunk (edge-padded
    past the episode end).
    """

    def __init__(
        self,
        repo_id: str,
        *,
        action_horizon: int = 1,
        action_sequence_keys: tuple[str, ...] = ("action",),
        episodes: list[int] | None = None,
    ):
        self.root = resolve_dataset_root(repo_id)
        self.metadata = _meta.LeRobotMetadata.load(self.root)
        self._action_horizon = action_horizon
        self._action_sequence_keys = action_sequence_keys
        self._tables = _EpisodeTableCache(self.metadata)
        self._videos = _VideoReader()

        all_episodes = {ep["episode_index"]: ep for ep in self.metadata.episodes}
        selected = sorted(all_episodes) if episodes is None else sorted(episodes)
        self._episode_indices = selected
        self._episode_lengths = {i: all_episodes[i]["length"] for i in selected}
        # Global frame index → (episode, frame) mapping.
        self._offsets = np.cumsum([0] + [self._episode_lengths[i] for i in selected])

    def __getstate__(self) -> dict:
        """Picklable for process-pool loader workers: drop decoder/table caches."""
        state = self.__dict__.copy()
        state["_tables"] = None
        state["_videos"] = None
        return state

    def __setstate__(self, state: dict) -> None:
        self.__dict__.update(state)
        self._tables = _EpisodeTableCache(self.metadata)
        self._videos = _VideoReader()

    @property
    def tasks(self) -> dict[int, str]:
        return self.metadata.tasks

    @property
    def fps(self) -> float:
        return self.metadata.fps

    @property
    def episode_indices(self) -> list[int]:
        return self._episode_indices

    def episode_length(self, episode_index: int) -> int:
        return self._episode_lengths[episode_index]

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def locate(self, index: int) -> tuple[int, int]:
        if index < 0 or index >= len(self):
            raise IndexError(index)
        pos = int(np.searchsorted(self._offsets, index, side="right")) - 1
        return self._episode_indices[pos], index - int(self._offsets[pos])

    def __getitem__(self, index: int) -> dict:
        episode_index, frame_index = self.locate(index)
        return self.get_frame(episode_index, frame_index)

    def get_frame(
        self,
        episode_index: int,
        frame_index: int,
        *,
        key_prefix: str = "",
        index_map=None,
        logical_length: int | None = None,
    ) -> dict:
        """Assemble one item: scalar columns, clamped action chunks, video frames.

        ``index_map``/``logical_length`` let views re-index an episode without
        re-implementing this body (augment_views.TimeScaledView): ``frame_index``
        and the action-chunk rows are *logical* positions, clamped to
        ``logical_length``, then mapped to physical table rows by ``index_map``
        (vectorized over index arrays).
        """
        table = self._tables.get(episode_index)
        length = self._episode_lengths[episode_index] if logical_length is None else logical_length
        phys = (lambda i: i) if index_map is None else index_map

        item: dict = {}
        for name, col in table.items():
            if name in self._action_sequence_keys:
                idx = np.minimum(
                    np.arange(frame_index, frame_index + self._action_horizon), length - 1
                )
                item[key_prefix + name] = np.asarray(col[phys(idx)])
            else:
                item[key_prefix + name] = col[phys(frame_index)]

        for video_key in self.metadata.video_keys:
            item[key_prefix + video_key] = self._videos.read_frame(
                self.metadata.video_path(episode_index, video_key), int(phys(frame_index))
            )
        return item


def episodes_split_through_task(
    dataset: LeRobotDataset, split: str, *, val_fraction: float = 0.1, seed: int = 42
) -> list[int]:
    """Per-task 90/10 episode split (parity: reference data_loader.py:185-212).

    Episodes are grouped by the task of their first frame and split within each
    group, so every task appears in both splits.
    """
    if split == "all":
        return dataset.episode_indices

    by_task: dict[int, list[int]] = collections.defaultdict(list)
    for ep in dataset.episode_indices:
        table = dataset._tables.get(ep)
        task_index = int(table["task_index"][0]) if "task_index" in table else 0
        by_task[task_index].append(ep)

    rng = np.random.default_rng(seed)
    train, val = [], []
    for task_index in sorted(by_task):
        eps = sorted(by_task[task_index])
        order = rng.permutation(len(eps))
        n_val = max(1, int(round(len(eps) * val_fraction))) if len(eps) > 1 else 0
        val_set = {eps[i] for i in order[:n_val]}
        val.extend(sorted(val_set))
        train.extend(e for e in eps if e not in val_set)

    if split == "train":
        return sorted(train)
    if split == "val":
        return sorted(val)
    raise ValueError(f"Unknown split {split!r} (expected train/val/all)")
