"""Data-pipeline throughput benchmark: LeRobot video dataset → device batches.

The reference mitigates video-decode cost with 8 torch worker processes
(SURVEY.md §6); this loader uses a GIL-releasing cv2 decode thread pool with
device-side prefetch. This script measures end-to-end loader samples/sec on a
synthetic 3-camera dataset so the input pipeline can be tuned against the train
step's consumption rate (batch 256 @ N samples/s/chip).

    python scripts/bench_loader.py --batch-size 64 --num-workers 8 --episodes 16
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import tempfile
import time

import numpy as np

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
def make_dataset(root: pathlib.Path, episodes: int, length: int, res: tuple[int, int]) -> pathlib.Path:
    from kai0_tpu.data.lerobot_writer import LeRobotDatasetWriter, feature_spec

    cams = {"top_head": res, "hand_left": res, "hand_right": res}
    feats = feature_spec(state_dim=14, action_dim=14, cameras=cams, fps=30)
    writer = LeRobotDatasetWriter(root, feats, fps=30)
    rng = np.random.default_rng(0)
    for _ in range(episodes):
        writer.add_episode(
            {
                "observation.state": rng.random((length, 14), dtype=np.float32),
                "action": rng.random((length, 14), dtype=np.float32),
            },
            task="fold the cloth",
            videos={
                f"observation.images.{c}": rng.integers(0, 255, (length, *res, 3)).astype(np.uint8)
                for c in cams
            },
        )
    writer.finalize()
    return root


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--num-workers", type=int, default=8)
    parser.add_argument("--episodes", type=int, default=8)
    parser.add_argument("--episode-length", type=int, default=100)
    parser.add_argument("--resolution", type=int, nargs=2, default=(480, 640))
    parser.add_argument("--num-batches", type=int, default=20)
    parser.add_argument("--dataset", default=None, help="Existing LeRobot root (skips synthesis)")
    parser.add_argument(
        "--cpu",
        action="store_true",
        help="keep batches on CPU devices — lets the loader run CONCURRENTLY with a "
        "TPU train process (one TPU process at a time on this host) to measure "
        "loader+train core contention (VERDICT round-2 item 9)",
    )
    args = parser.parse_args()

    import dataclasses

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from kai0_tpu.training import config as _config
    from kai0_tpu.training import data_loader as _data_loader
    from kai0_tpu.training.robot_configs import LerobotAgilexDataConfig

    with tempfile.TemporaryDirectory(prefix="bench_loader_") as tmp:
        if args.dataset:
            root = args.dataset
        else:
            print(f"Synthesizing {args.episodes} episodes of {args.episode_length} frames "
                  f"@ {args.resolution}...", file=sys.stderr)
            root = str(make_dataset(pathlib.Path(tmp) / "ds", args.episodes, args.episode_length,
                                    tuple(args.resolution)))

        config = dataclasses.replace(
            _config.get_config("pi05_flatten_fold_normal"),
            data=LerobotAgilexDataConfig(
                repo_id=root, default_prompt="fold the cloth", use_delta_joint_actions=False
            ),
            batch_size=args.batch_size,
            num_workers=args.num_workers,
            exp_name="bench_loader",
        )
        loader = _data_loader.create_data_loader(
            config, num_batches=args.num_batches + 2, skip_norm_stats=True
        )
        it = iter(loader)
        # Warm: first batches fill the prefetch queue + page in the videos.
        next(it), next(it)
        t0 = time.time()
        n = 0
        for obs, actions in it:
            jax.block_until_ready(actions)
            n += actions.shape[0]
        elapsed = time.time() - t0
        print(f"loader throughput: {n / elapsed:.1f} samples/s "
              f"({args.num_batches} batches of {args.batch_size}, workers={args.num_workers})")


if __name__ == "__main__":
    main()
