"""Convert DAgger/ALOHA-style HDF5 episodes (+ per-camera mp4s) to LeRobot format.

Equivalent of the reference ``train_deploy_alignment/data_augment/convert_h5_lerobot.py``
(features schema :22-53, episode loop :56+) built on this framework's
:class:`kai0_tpu.data.lerobot_writer.LeRobotDatasetWriter`. Input layout matches
:class:`kai0_tpu.deploy.dagger.DAggerCollector` output:

    <src>/episode_N.hdf5             /observations/{qpos,qvel,effort}, /action
    <src>/video/<cam>/episode_N.mp4  per-camera RGB export
"""

from __future__ import annotations

import pathlib

import numpy as np

from kai0_tpu.data import lerobot_meta as _meta
from kai0_tpu.data.lerobot_writer import LeRobotDatasetWriter


def _read_video(path: pathlib.Path) -> np.ndarray:
    import cv2

    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise FileNotFoundError(f"Cannot open video {path}")
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[..., ::-1].copy())
    cap.release()
    return np.stack(frames)


def convert_h5_to_lerobot(
    src_dir: pathlib.Path | str,
    dst: pathlib.Path | str,
    *,
    task: str,
    cameras: list[str],
    fps: float = 30.0,
    state_key: str = "observations/qpos",
    action_key: str = "action",
) -> _meta.LeRobotMetadata:
    """Convert every ``episode_*.hdf5`` under ``src_dir`` into a LeRobot dataset."""
    import h5py

    src_dir = pathlib.Path(src_dir)
    episode_files = sorted(src_dir.glob("episode_*.hdf5"), key=lambda p: int(p.stem.split("_")[-1]))
    if not episode_files:
        raise ValueError(f"No episode_*.hdf5 files under {src_dir}")

    # Infer dims + image sizes from the first episode.
    with h5py.File(episode_files[0]) as f:
        state_dim = f[state_key].shape[1]
        action_dim = f[action_key].shape[1]
    first_idx = episode_files[0].stem.split("_")[-1]
    cam_sizes = {}
    for cam in cameras:
        video = src_dir / "video" / cam / f"episode_{first_idx}.mp4"
        frames = _read_video(video)
        cam_sizes[cam] = frames.shape[1:3]

    from kai0_tpu.data.lerobot_writer import feature_spec

    feats = feature_spec(state_dim=state_dim, action_dim=action_dim, cameras=cam_sizes, fps=fps)
    writer = LeRobotDatasetWriter(dst, feats, fps=fps)

    for path in episode_files:
        idx = path.stem.split("_")[-1]
        with h5py.File(path) as f:
            state = np.asarray(f[state_key], dtype=np.float32)
            action = np.asarray(f[action_key], dtype=np.float32)
        videos = {}
        for cam in cameras:
            frames = _read_video(src_dir / "video" / cam / f"episode_{idx}.mp4")
            n = min(len(frames), len(state))
            videos[f"observation.images.{cam}"] = frames[:n]
        n = min(len(state), *(len(v) for v in videos.values()))
        writer.add_episode(
            {"observation.state": state[:n], "action": action[:n]},
            task=task,
            videos={k: v[:n] for k, v in videos.items()},
        )
    return writer.finalize()
