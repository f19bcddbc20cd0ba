"""LeRobot dataset writer (builder).

Counterpart of the reference's ``mini_lerobot`` builder
(``train_deploy_alignment/data_augment/mini_lerobot/builder.py:104-200``) and the
``LeRobotDataset.create``/``save_episode`` path used by ``scripts/merge_lerobot.py``.
Episodes are appended one at a time: vector features go to a per-episode parquet,
video features are encoded to mp4 (cv2, mp4v — the reference uses libsvtav1 via
ffmpeg; codec is a container detail, not part of the dataset contract), and the
meta files are rewritten on ``finalize()``.
"""

from __future__ import annotations

import pathlib

import numpy as np

from kai0_tpu.data import lerobot_meta as _meta


def feature_spec(
    *,
    state_dim: int | None = None,
    action_dim: int | None = None,
    cameras: dict[str, tuple[int, int]] | None = None,
    fps: float = 30.0,
    extra: dict[str, dict] | None = None,
) -> dict[str, dict]:
    """Convenience schema builder for common robot datasets."""
    features: dict[str, dict] = {}
    if state_dim is not None:
        features["observation.state"] = {
            "dtype": "float32",
            "shape": [state_dim],
            "names": [f"motor_{i}" for i in range(state_dim)],
        }
    if action_dim is not None:
        features["action"] = {
            "dtype": "float32",
            "shape": [action_dim],
            "names": [f"motor_{i}" for i in range(action_dim)],
        }
    for cam, (h, w) in (cameras or {}).items():
        features[f"observation.images.{cam}"] = {
            "dtype": "video",
            "shape": [h, w, 3],
            "names": ["height", "width", "channel"],
            "info": {"video.fps": fps, "video.codec": "mp4v", "video.pix_fmt": "yuv420p"},
        }
    features.update(extra or {})
    return features


class LeRobotDatasetWriter:
    """Append-only LeRobot dataset builder."""

    def __init__(
        self,
        root: pathlib.Path | str,
        features: dict[str, dict],
        *,
        fps: float = 30.0,
        robot_type: str = "unknown",
        chunks_size: int = _meta.DEFAULT_CHUNK_SIZE,
    ):
        self.root = pathlib.Path(root)
        if self.root.exists() and any(self.root.iterdir()):
            raise FileExistsError(f"Dataset root {self.root} already exists and is not empty")
        self.root.mkdir(parents=True, exist_ok=True)
        self.metadata = _meta.LeRobotMetadata(
            root=self.root,
            info=_meta.new_info(features, fps, robot_type=robot_type, chunks_size=chunks_size),
            episodes=[],
            tasks={},
        )
        self._task_to_index: dict[str, int] = {}
        self._total_frames = 0

    @property
    def video_keys(self) -> list[str]:
        return self.metadata.video_keys

    def task_index(self, task: str) -> int:
        if task not in self._task_to_index:
            index = len(self._task_to_index)
            self._task_to_index[task] = index
            self.metadata.tasks[index] = task
        return self._task_to_index[task]

    def add_episode(
        self,
        data: dict[str, np.ndarray],
        *,
        task: str | list[str],
        videos: dict[str, np.ndarray] | None = None,
    ) -> int:
        """Append one episode.

        ``data`` holds per-frame vector/scalar features ``[T, ...]``; ``videos``
        holds uint8 RGB arrays ``[T, H, W, 3]`` per video key. ``task`` may be one
        string for the episode or a per-frame list (stage-advantage rewrites tasks
        per frame via task_index).
        """
        videos = videos or {}
        episode_index = len(self.metadata.episodes)
        lengths = {len(v) for v in list(data.values()) + list(videos.values())}
        if len(lengths) != 1:
            raise ValueError(f"Inconsistent episode lengths: { {k: len(v) for k, v in data.items()} }")
        (length,) = lengths

        if isinstance(task, str):
            task_list = [task] * length
        else:
            task_list = list(task)
            if len(task_list) != length:
                raise ValueError("Per-frame task list length mismatch")
        task_indices = np.asarray([self.task_index(t) for t in task_list], dtype=np.int64)

        columns: dict[str, object] = {}
        for name, value in data.items():
            value = np.asarray(value)
            columns[name] = list(value) if value.ndim > 1 else value
        columns.setdefault("timestamp", np.arange(length, dtype=np.float32) / self.metadata.fps)
        columns.setdefault("frame_index", np.arange(length, dtype=np.int64))
        columns["episode_index"] = np.full(length, episode_index, dtype=np.int64)
        columns["index"] = np.arange(self._total_frames, self._total_frames + length, dtype=np.int64)
        columns["task_index"] = task_indices

        import pandas as pd

        path = self.metadata.data_path(episode_index)
        path.parent.mkdir(parents=True, exist_ok=True)
        pd.DataFrame(columns).to_parquet(path)

        for video_key in self.video_keys:
            if video_key not in videos:
                raise ValueError(f"Missing video for feature {video_key}")
            self._write_video(self.metadata.video_path(episode_index, video_key), videos[video_key])

        self.metadata.episodes.append(
            {
                "episode_index": episode_index,
                "tasks": sorted(set(task_list)),
                "length": int(length),
            }
        )
        self._total_frames += length
        return episode_index

    def _write_video(self, path: pathlib.Path, frames: np.ndarray) -> None:
        import cv2

        path.parent.mkdir(parents=True, exist_ok=True)
        h, w = frames.shape[1:3]
        writer = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*"mp4v"), self.metadata.fps, (w, h)
        )
        if not writer.isOpened():
            raise IOError(f"Cannot open video writer for {path}")
        for frame in frames:
            writer.write(np.ascontiguousarray(frame[..., ::-1]))  # RGB → BGR
        writer.release()

    def finalize(self) -> _meta.LeRobotMetadata:
        info = self.metadata.info
        info["total_episodes"] = len(self.metadata.episodes)
        info["total_frames"] = self._total_frames
        info["total_tasks"] = len(self.metadata.tasks)
        info["total_videos"] = len(self.metadata.episodes) * len(self.video_keys)
        info["total_chunks"] = (
            (len(self.metadata.episodes) + self.metadata.chunks_size - 1) // self.metadata.chunks_size
        )
        info["splits"] = {"train": f"0:{len(self.metadata.episodes)}"}
        self.metadata.save()
        return self.metadata
