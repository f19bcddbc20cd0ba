"""Convert HDF5 episodes (+ per-camera mp4s) to LeRobot format.

Equivalent of the reference `train_deploy_alignment/data_augment/convert_h5_lerobot.py`.
Library: `kai0_tpu.augment.convert_h5`.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent.parent))
from kai0_tpu.augment import convert_h5


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--src", required=True, help="Directory with episode_*.hdf5 + video/<cam>/")
    parser.add_argument("--dst", required=True, help="Output LeRobot dataset root")
    parser.add_argument("--task", required=True, help="Task prompt string")
    parser.add_argument("--cameras", nargs="+", default=["top_head", "hand_left", "hand_right"])
    parser.add_argument("--fps", type=float, default=30.0)
    args = parser.parse_args()

    meta = convert_h5.convert_h5_to_lerobot(
        args.src, args.dst, task=args.task, cameras=args.cameras, fps=args.fps
    )
    print(f"wrote {meta.info['total_episodes']} episodes, {meta.info['total_frames']} frames → {args.dst}")


if __name__ == "__main__":
    main()
