"""Time-scaling augmentation CLI (keep every Nth frame).

Equivalent of the reference `train_deploy_alignment/data_augment/time_scaling.py`:
full mode scales every episode; split mode scales a random fraction and merges with
the untouched rest. Library: `kai0_tpu.augment.time_scaling`.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import importlib.util

if importlib.util.find_spec("kai0_tpu") is None:  # bare checkout (not pip-installed)
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent.parent))
from kai0_tpu.augment import time_scaling


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--src", required=True, help="Source LeRobot dataset root")
    parser.add_argument("--dst", required=True, help="Output dataset root")
    parser.add_argument("--extraction-factor", type=int, default=2, help="Keep every Nth frame")
    parser.add_argument("--split", action="store_true",
                        help="Scale only a fraction of episodes and merge with the rest")
    parser.add_argument("--extract-fraction", type=float, default=0.5)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    if args.split:
        meta = time_scaling.time_scaling_with_split(
            args.src, args.dst, args.extraction_factor,
            extract_fraction=args.extract_fraction, seed=args.seed,
        )
    else:
        meta = time_scaling.time_scale_dataset(args.src, args.dst, args.extraction_factor)
    print(f"wrote {meta.info['total_episodes']} episodes, {meta.info['total_frames']} frames → {args.dst}")


if __name__ == "__main__":
    main()
