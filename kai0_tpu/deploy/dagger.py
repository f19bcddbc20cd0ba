"""DAgger episode collection: policy-in-the-loop data capture to HDF5 + mp4.

Library form of the reference's 2.4k-line ROS collector
(``train_deploy_alignment/dagger/agilex/agilex_openpi_dagger_collect.py``):

- ``DAggerCollector`` (reference ``SimpleDAggerCollector`` :64-253 +
  ``collect_data.save_data`` :66-135): buffers per-frame observations/actions with
  intervention labels and writes ALOHA-style HDF5 episodes
  (``/observations/{qpos,qvel,effort}``, ``/action``, ``/base_action``) plus
  per-camera mp4 exports under ``video/<cam>/episode_N.mp4``.
- ``DaggerStateMachine`` (reference ``keyboard_monitor_thread`` :255-346): the
  keyboard-driven mode logic (infer / dagger / record / save / resume), decoupled
  from any keyboard backend so it is unit-testable and reusable from ROS or
  teleoperation stacks.

Episodes saved here convert to LeRobot format with
``kai0_tpu.augment.convert_h5.convert_h5_to_lerobot``.
"""

from __future__ import annotations

import dataclasses
import pathlib

import numpy as np


@dataclasses.dataclass
class _Frame:
    qpos: np.ndarray
    qvel: np.ndarray
    effort: np.ndarray
    action: np.ndarray
    base_action: np.ndarray
    images: dict[str, np.ndarray]
    intervention: bool


class DAggerCollector:
    """Buffers frames during an episode; ``save_episode`` writes HDF5 (+mp4)."""

    def __init__(
        self,
        camera_names: list[str],
        dataset_dir: str | pathlib.Path,
        *,
        task_name: str | None = None,
        fps: float = 30.0,
    ):
        self.camera_names = list(camera_names)
        self.dataset_dir = pathlib.Path(dataset_dir)
        if task_name:
            self.dataset_dir = self.dataset_dir / task_name
        self.fps = fps
        self._frames: list[_Frame] = []
        self.is_collecting = False
        self.episode_idx = self._find_next_episode_idx()

    def _find_next_episode_idx(self) -> int:
        if not self.dataset_dir.exists():
            return 0
        existing = [
            int(p.stem.split("_")[-1])
            for p in self.dataset_dir.glob("episode_*.hdf5")
            if p.stem.split("_")[-1].isdigit()
        ]
        return max(existing, default=-1) + 1

    def start_collection(self) -> None:
        self._frames.clear()
        self.is_collecting = True

    def stop_collection(self) -> None:
        self.is_collecting = False

    @property
    def frame_count(self) -> int:
        return len(self._frames)

    def has_data(self) -> bool:
        return bool(self._frames)

    def add_frame(
        self,
        observation: dict,
        action: np.ndarray,
        *,
        intervention: bool = False,
    ) -> None:
        """Append one frame. ``observation`` needs qpos/qvel/effort/images (+base_vel)."""
        if not self.is_collecting:
            return
        qpos = np.asarray(observation["qpos"], dtype=np.float32)
        self._frames.append(
            _Frame(
                qpos=qpos,
                qvel=np.asarray(observation.get("qvel", np.zeros_like(qpos)), dtype=np.float32),
                effort=np.asarray(observation.get("effort", np.zeros_like(qpos)), dtype=np.float32),
                action=np.asarray(action, dtype=np.float32),
                base_action=np.asarray(observation.get("base_vel", np.zeros(2)), dtype=np.float32),
                images={cam: np.asarray(observation["images"][cam]) for cam in self.camera_names},
                intervention=bool(intervention),
            )
        )

    def discard_episode(self) -> None:
        self._frames.clear()
        self.is_collecting = False

    def save_episode(self, *, export_video: bool = True) -> pathlib.Path | None:
        """Write ``episode_<idx>.hdf5`` (+ per-camera mp4s); returns the HDF5 path."""
        import h5py

        if not self._frames:
            return None
        self.dataset_dir.mkdir(parents=True, exist_ok=True)
        path = self.dataset_dir / f"episode_{self.episode_idx}.hdf5"
        n = len(self._frames)
        dim = len(self._frames[0].qpos)

        with h5py.File(path, "w", rdcc_nbytes=1024**2 * 2) as root:
            root.attrs["sim"] = False
            root.attrs["compress"] = False
            obs = root.create_group("observations")
            obs.create_dataset("qpos", data=np.stack([f.qpos for f in self._frames]), shape=(n, dim))
            obs.create_dataset("qvel", data=np.stack([f.qvel for f in self._frames]), shape=(n, dim))
            obs.create_dataset("effort", data=np.stack([f.effort for f in self._frames]), shape=(n, dim))
            root.create_dataset("action", data=np.stack([f.action for f in self._frames]), shape=(n, dim))
            root.create_dataset(
                "base_action", data=np.stack([f.base_action for f in self._frames]), shape=(n, 2)
            )
            # Intervention labels (DAgger: which frames the human corrected).
            root.create_dataset(
                "intervention", data=np.asarray([f.intervention for f in self._frames], dtype=bool)
            )

        if export_video:
            import cv2

            video_dir = self.dataset_dir / "video"
            for cam in self.camera_names:
                cam_dir = video_dir / cam
                cam_dir.mkdir(parents=True, exist_ok=True)
                frames = [f.images[cam] for f in self._frames]
                h, w = frames[0].shape[:2]
                writer = cv2.VideoWriter(
                    str(cam_dir / f"episode_{self.episode_idx}.mp4"),
                    cv2.VideoWriter_fourcc(*"mp4v"),
                    self.fps,
                    (w, h),
                )
                for img in frames:
                    if img.dtype != np.uint8:
                        img = (img * 255).astype(np.uint8) if img.max() <= 1.0 else img.astype(np.uint8)
                    writer.write(np.ascontiguousarray(img[..., ::-1]))
                writer.release()

        self._frames.clear()
        self.is_collecting = False
        self.episode_idx += 1
        return path


class DaggerStateMachine:
    """Keyboard-driven DAgger mode logic, decoupled from the keyboard backend.

    States: ``idle`` → ``infer`` (policy executes) ⇄ ``dagger`` (human corrects,
    frames labeled interventions); ``record`` toggles collection; ``save`` ends the
    episode. Feed key events via :meth:`on_key`; poll :attr:`mode` /
    :attr:`recording` from the control loop.
    """

    KEYMAP = {
        "enter": "infer",
        "d": "dagger",
        " ": "toggle_record",
        "s": "save",
        "r": "resume",
        "q": "quit",
    }

    def __init__(self):
        self.mode = "idle"  # idle | infer | dagger | quit
        self.recording = False
        self.save_requested = False

    def on_key(self, key: str) -> str:
        action = self.KEYMAP.get(key.lower(), None)
        if action == "infer":
            self.mode = "infer"
        elif action == "dagger":
            # Human takes over — policy output ignored, frames marked intervention.
            self.mode = "dagger"
        elif action == "toggle_record":
            self.recording = not self.recording
        elif action == "save":
            self.save_requested = True
            self.recording = False
        elif action == "resume":
            self.mode = "infer"
        elif action == "quit":
            self.mode = "quit"
        return self.mode

    @property
    def intervening(self) -> bool:
        return self.mode == "dagger"

    def consume_save_request(self) -> bool:
        req, self.save_requested = self.save_requested, False
        return req
