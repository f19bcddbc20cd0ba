"""Batched TPU advantage evaluation over episode videos.

JAX-native equivalent of the reference ``stage_advantage/annotation/evaluator.py``
(``SimpleValueEvaluator``): loads a trained advantage-estimator checkpoint, decodes
the three camera videos per episode, and runs batched ``sample_values`` inference.

Two modes (reference :249-485 and :486+):

- ``evaluate_video_2timesteps_advantages`` (KAI0): per frame n predicts
  * relative_advantage = value(history=frame n, current=frame n+K)
  * absolute_value     = value(history=frame 0, current=frame n), 0 for frame 0
  * absolute_advantage = absolute_value[n+K] − absolute_value[n]
  all normalized by the actual interval at episode tails and clipped to [−1, 1].
- ``evaluate_video_1timestep_advantage`` (PI06): absolute value only.

TPU-first design: fixed batch shape (last batch is padded, not re-traced), one jitted
program for value inference, host-side decode/resize overlapped with the device step
through a one-batch prefetch (same overlap the reference gets from its ThreadPool,
:327+).
"""

from __future__ import annotations

import concurrent.futures
import functools
import logging
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from kai0_tpu.models import model as _model
from kai0_tpu.models import tokenizer as _tokenizer
from kai0_tpu.shared import image_tools

logger = logging.getLogger(__name__)

# Model image keys: current frame (suffix _0) and history/comparison frame (_-100).
_CURRENT_KEYS = ("base_0_rgb", "left_wrist_0_rgb", "right_wrist_0_rgb")
_HISTORY_KEYS = ("base_-100_rgb", "left_wrist_-100_rgb", "right_wrist_-100_rgb")


def load_video_frames(video_path: str | pathlib.Path, frame_interval: int = 1) -> list[np.ndarray]:
    """Decode an mp4 into a list of RGB uint8 frames (every ``frame_interval``-th)."""
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise FileNotFoundError(f"Cannot open video {video_path}")
    frames = []
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx % frame_interval == 0:
            frames.append(frame[..., ::-1].copy())  # BGR → RGB
        idx += 1
    cap.release()
    return frames


class SimpleValueEvaluator:
    """Loads a trained estimator and evaluates per-frame advantages over videos."""

    def __init__(
        self,
        config_name: str,
        ckpt_dir: str | pathlib.Path,
        *,
        num_workers: int = 4,
        batch_size: int = 8,
        params: dict | None = None,
    ):
        from kai0_tpu.training import checkpoints as _checkpoints
        from kai0_tpu.training import config as _config

        self.config = _config.get_config(config_name)
        self.model_config = self.config.model
        self.batch_size = batch_size
        self.num_workers = num_workers
        self._executor = concurrent.futures.ThreadPoolExecutor(max_workers=num_workers)

        if params is None:
            from kai0_tpu.interop import is_torch_checkpoint, load_torch_checkpoint

            if is_torch_checkpoint(ckpt_dir):
                # kai0's released estimator checkpoints are torch model.safetensors
                # (reference scripts/train_pytorch.py:149-196).
                params = load_torch_checkpoint(
                    ckpt_dir, self.model_config, dtype=jnp.bfloat16, strict=False
                )
            else:
                params_path = pathlib.Path(ckpt_dir) / "params"
                if not params_path.exists():
                    params_path = pathlib.Path(ckpt_dir)
                params = _checkpoints.restore_params(params_path, dtype=jnp.bfloat16)
        self._params = params

        self.tokenizer = _tokenizer.PaligemmaTokenizer(self.model_config.max_token_len)
        self._rng = jax.random.key(0)

        # One fixed-shape jitted program: batch is always `batch_size` (padded).
        @functools.partial(jax.jit, static_argnames=())
        def _values(params, rng, obs):
            return self.model_config.sample_values(params, rng, obs)

        self._values_fn = _values

    def shutdown(self) -> None:
        self._executor.shutdown(wait=False)

    # ---------------------------------------------------------------- helpers

    def _prep_image(self, rgb: np.ndarray) -> np.ndarray:
        """HWC uint8 → model resolution uint8 (resize with aspect-preserving pad)."""
        h, w = _model.IMAGE_RESOLUTION
        return image_tools.resize_with_pad_np(rgb[None], h, w)[0]

    def _load_videos(self, video_paths, frame_interval: int):
        futures = [
            self._executor.submit(load_video_frames, p, frame_interval) for p in video_paths
        ]
        return [f.result() for f in futures]

    def _infer_values(self, history: list[list[np.ndarray]], current: list[list[np.ndarray]], tokens, token_masks):
        """One padded fixed-shape batch → np.float32[actual_batch]."""
        actual = len(history[0])
        pad = self.batch_size - actual

        def stack(cam_frames):
            arr = np.stack([self._prep_image(f) for f in cam_frames])
            if pad:
                arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)])
            return arr

        images = {}
        for key, cam in zip(_HISTORY_KEYS, history):
            images[key] = stack(cam)
        for key, cam in zip(_CURRENT_KEYS, current):
            images[key] = stack(cam)
        image_masks = {k: np.ones(self.batch_size, dtype=bool) for k in images}
        obs = _model.Observation.from_dict(
            {
                "image": images,
                "image_mask": image_masks,
                "state": np.zeros((self.batch_size, self.model_config.action_dim), dtype=np.float32),
                "tokenized_prompt": np.tile(tokens[None], (self.batch_size, 1)),
                "tokenized_prompt_mask": np.tile(token_masks[None], (self.batch_size, 1)),
            }
        )
        values = self._values_fn(self._params, self._rng, obs)
        return np.asarray(values, dtype=np.float32)[:actual, 0]

    # ------------------------------------------------------------------ modes

    def evaluate_video_2timesteps_advantages(
        self,
        video_paths,
        prompt: str,
        *,
        batch_size: int | None = None,
        frame_interval: int = 1,
        relative_interval: int = 50,
        min_frame_index: int | None = None,
        max_frame_index: int | None = None,
    ) -> list[dict]:
        """Relative + absolute advantage per frame (reference :249-485)."""
        if len(video_paths) != 3:
            raise ValueError("Expected 3 video paths: (top, left, right)")
        if batch_size is not None:
            self.batch_size = batch_size
        cams = self._load_videos(video_paths, frame_interval)
        n_frames = {len(c) for c in cams}
        if len(n_frames) != 1:
            raise ValueError(f"Inconsistent frame counts: {[len(c) for c in cams]}")

        lo = min_frame_index or 0
        hi = max_frame_index + 1 if max_frame_index is not None else None
        cams = [c[lo:hi] for c in cams]
        num_frames = len(cams[0])
        if num_frames < 2:
            raise ValueError(f"Insufficient frames: {num_frames}, need at least 2")
        max_idx = num_frames - 1

        tokens, token_masks = self.tokenizer.tokenize(prompt)
        results = []
        for start in range(0, num_frames, self.batch_size):
            idxs = list(range(start, min(start + self.batch_size, num_frames)))
            future_idxs = [min(j + relative_interval, max_idx) for j in idxs]
            # relative: history = frame n, current = frame n+K
            rel = self._infer_values(
                [[c[j] for j in idxs] for c in cams],
                [[c[f] for f in future_idxs] for c in cams],
                tokens,
                token_masks,
            )
            # absolute: history = frame 0, current = frame n
            absolute = self._infer_values(
                [[c[0]] * len(idxs) for c in cams],
                [[c[j] for j in idxs] for c in cams],
                tokens,
                token_masks,
            )
            for k, (j, f) in enumerate(zip(idxs, future_idxs)):
                # Normalize relative advantage when the tail shortens the interval.
                if f == j:
                    rel_val = 0.0
                elif f - j == relative_interval:
                    rel_val = float(rel[k])
                else:
                    rel_val = float(rel[k]) / (f - j) * relative_interval
                results.append(
                    {
                        "frame_idx": j,
                        "future_frame_idx": f,
                        "relative_advantage": rel_val,
                        "absolute_value": 0.0 if j == 0 else float(absolute[k]),
                    }
                )

        # absolute_advantage = Δ absolute_value over the (interval-normalized) lookahead.
        by_idx = {r["frame_idx"]: r for r in results}
        for r in results:
            j, f = r["frame_idx"], r["future_frame_idx"]
            if f == j:
                adv = 0.0
            else:
                adv = by_idx[f]["absolute_value"] - r["absolute_value"]
                if f - j != relative_interval:
                    adv = adv / (f - j) * relative_interval
            r["absolute_advantage"] = float(np.clip(adv, -1.0, 1.0))
            r["relative_advantage"] = float(np.clip(r["relative_advantage"], -1.0, 1.0))
        logger.info(f"Evaluated {len(results)} frames (2-timestep mode)")
        return results

    def evaluate_video_1timestep_advantage(
        self,
        video_paths,
        prompt: str,
        *,
        batch_size: int | None = None,
        frame_interval: int = 1,
        min_frame_index: int | None = None,
        max_frame_index: int | None = None,
    ) -> list[dict]:
        """Absolute value only (PI06 mode, reference :486+)."""
        if len(video_paths) != 3:
            raise ValueError("Expected 3 video paths: (top, left, right)")
        if batch_size is not None:
            self.batch_size = batch_size
        cams = self._load_videos(video_paths, frame_interval)
        lo = min_frame_index or 0
        hi = max_frame_index + 1 if max_frame_index is not None else None
        cams = [c[lo:hi] for c in cams]
        num_frames = len(cams[0])
        tokens, token_masks = self.tokenizer.tokenize(prompt)

        results = []
        for start in range(0, num_frames, self.batch_size):
            idxs = list(range(start, min(start + self.batch_size, num_frames)))
            absolute = self._infer_values(
                [[c[0]] * len(idxs) for c in cams],
                [[c[j] for j in idxs] for c in cams],
                tokens,
                token_masks,
            )
            for k, j in enumerate(idxs):
                results.append(
                    {
                        "frame_idx": j,
                        "absolute_value": 0.0 if j == 0 else float(np.clip(absolute[k], -1.0, 1.0)),
                    }
                )
        logger.info(f"Evaluated {len(results)} frames (1-timestep mode)")
        return results
